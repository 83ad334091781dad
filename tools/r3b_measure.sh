#!/bin/bash
# Round-3 measurement queue, phase 2: waits for the in-flight bench_scan to
# drain, then (1) compiled-TPU gate + sweep for the FM_SCAN_FUSE variant,
# (2) VMEM-budget / d-cap / l-cap sweeps, (3) combined-winner run,
# (4) verify-drive (test.py CLI), (5) bench at defaults, (6) profile,
# (7) training-trajectory evidence. Results land in bench_artifacts/r3/.
set -u
OUT="$(dirname "$0")/../bench_artifacts/r3"
mkdir -p $OUT
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

# drain any in-flight bench_scan (timing-sensitive: don't share the core)
while pgrep -f bench_scan.py >/dev/null 2>&1; do sleep 20; done

run_bench() {  # name, n_stages, env...
  local name=$1; local nst=$2; shift 2
  echo "==== $name" | tee -a $OUT/sweep.log
  env "$@" JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
    timeout 1800 python tools/bench_scan.py --chained --bwd --stages $nst \
      --dtype bf16 --batch 24 2>/dev/null | tee -a $OUT/sweep.log
}

# compiled-kernel gate for the fused path (Mosaic lowering + numerics on
# the real chip; interpret-mode tests cannot catch lowering rejections)
echo "==== fuse_tpu_gate" | tee -a $OUT/sweep.log
FM_SCAN_FUSE=1 FM_TESTS_TPU=1 timeout 1800 \
  python -m pytest tests/test_scan.py -m tpu -q 2>&1 | tail -2 \
  | tee -a $OUT/sweep.log

run_bench fuse 4 FM_SCAN_FUSE=1
run_bench fuse_pinvexp_rowsel 2 FM_SCAN_FUSE=1 FM_SCAN_PINV=exp FM_SCAN_ROWSEL=slice
run_bench budget_1M_512K 4 FM_SCAN_FWD_BUDGET=1048576 FM_SCAN_BWD_BUDGET=524288
run_bench budget_2M_1M 4 FM_SCAN_FWD_BUDGET=2097152 FM_SCAN_BWD_BUDGET=1048576
run_bench dcap_384 4 FM_SCAN_DCAP=384
run_bench lcap_512 2 FM_SCAN_LCAP=512
echo "[r3b] sweep done $(date)" | tee -a $OUT/log

echo "==== bench_defaults" | tee -a $OUT/sweep.log
timeout 2400 python bench.py 2>/dev/null | tail -1 | tee $OUT/bench_defaults.json

echo "==== profile" | tee -a $OUT/log
timeout 2400 python tools/profile_step.py --batch 24 --dtype bf16 \
  --logdir /tmp/r3/profile > $OUT/profile.log 2>&1

echo "==== trajectory" | tee -a $OUT/log
timeout 5400 python tools/train_trajectory.py --steps 200 --batch 12 \
  --out $OUT/trajectory > $OUT/trajectory.log 2>&1
tail -20 $OUT/trajectory.log | tee -a $OUT/log

echo "[r3b] ALL DONE $(date)" | tee -a $OUT/log
