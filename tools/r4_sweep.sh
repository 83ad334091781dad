#!/bin/bash
# Round-4 kernel sweep: prologue fusion (lowrank) x d-cap on the model
# stage shapes, chained fwd / fwd+bwd, bf16 b24. Output: bench_artifacts/r4/.
set -u
OUT="$(dirname "$0")/../bench_artifacts/r4"
mkdir -p $OUT
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
run() {  # name, extra-args..., env via leading VAR=VAL pairs handled by env
  local name=$1; shift
  echo "==== $name" | tee -a $OUT/sweep.log
  timeout 2400 env "$@" python tools/bench_scan.py --chained --bwd \
      --stages 4 --dtype bf16 --batch 24 2>/dev/null | tee -a $OUT/sweep.log
}
run materialized FM_DUMMY=1
run lowrank FM_BENCH_LOWRANK=1
run lowrank_dcap384 FM_BENCH_LOWRANK=1 FM_SCAN_DCAP=384
run lowrank_bwdbudget_512k FM_BENCH_LOWRANK=1 FM_SCAN_BWD_BUDGET=524288
echo done | tee -a $OUT/sweep.log
