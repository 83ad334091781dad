"""Attribute the scan BACKWARD kernel's time to its computation stages via
FM_SCAN_ABLATE (timing-only flags that skip work and produce wrong
gradients -- see scan_pallas.py). Each variant runs the chained micro-bench
in a subprocess (env read at import); the per-stage cost is
t(none) - t(ablated)."""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(HERE, "bench_scan.py")

# "parts" (P = Pinv = 1) SIGABRTs Mosaic's vector layout pass on the
# degenerate all-ones constant -- its cost is inferred by subtraction from
# the "recompute,rev" variant (both scans skipped) instead.
VARIANTS = ["", "recompute", "rev", "daa", "loop", "graddots",
            "build", "recompute,rev"]


def main():
    for flags in VARIANTS:
        env = dict(os.environ, FM_SCAN_ABLATE=flags,
                   JAX_COMPILATION_CACHE_DIR="/tmp/jaxcache")
        print(f"==== FM_SCAN_ABLATE={flags!r}", flush=True)
        subprocess.run(
            [sys.executable, BENCH, "--chained", "--bwd", "--stages",
             os.environ.get("FM_ABLATE_STAGES", "2"),
             "--dtype", "bf16", "--batch", "24"],
            env=env)


if __name__ == "__main__":
    main()
