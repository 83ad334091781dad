"""Sweep scan-kernel block-shape env knobs (LCAP / DCAP / VMEM budgets) via
subprocesses (the envs are read at import). Prints one line per config."""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(HERE, "bench_scan.py")

CONFIGS = [
    # (label, env overrides)
    ("base", {}),
    ("lcap512", {"FM_SCAN_LCAP": "512"}),
    ("lcap1024", {"FM_SCAN_LCAP": "1024"}),
    ("dcap128", {"FM_SCAN_DCAP": "128"}),
    ("dcap512", {"FM_SCAN_DCAP": "512"}),
    ("lcap1024+bud2x", {"FM_SCAN_LCAP": "1024",
                        "FM_SCAN_FWD_BUDGET": str(512 * 1024),
                        "FM_SCAN_BWD_BUDGET": str(256 * 1024)}),
]


def main():
    extra = sys.argv[1:]
    for label, env in CONFIGS:
        full = dict(os.environ,
                    JAX_COMPILATION_CACHE_DIR="/tmp/jaxcache", **env)
        print(f"==== {label} {env}", flush=True)
        subprocess.run(
            [sys.executable, BENCH, "--chained", "--bwd", "--stages", "2",
             "--dtype", "bf16", "--batch", "24"] + extra,
            env=full)


if __name__ == "__main__":
    main()
