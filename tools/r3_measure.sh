#!/bin/bash
# Round-3 measurement queue: waits for the TPU tunnel to serve, then runs
# (1) the kernel-variant sweep (pinv, rowsel, nloop, VMEM budgets, d-cap),
# (2) the end-to-end bench at defaults, (3) the device-op profile, and
# (4) the 200-step training-trajectory evidence (VERDICT r2 item 8).
# Results land in bench_artifacts/r3/ (in-repo, committable evidence).
set -u
OUT="$(dirname "$0")/../bench_artifacts/r3"
mkdir -p $OUT
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

echo "[r3] waiting for tunnel..." | tee -a $OUT/log
while true; do
  if timeout 180 python -c "
import jax, jax.numpy as jnp
print('OK', float(jax.jit(lambda a: (a@a).sum())(jnp.ones((128,128)))))" \
      2>/dev/null | grep -q OK; then
    echo "[r3] tunnel up at $(date)" | tee -a $OUT/log; break
  fi
  echo "[r3] wedged $(date)" >> $OUT/log
  sleep 120
done

run_bench() {  # name, n_stages, env...
  local name=$1; local nst=$2; shift 2
  echo "==== $name" | tee -a $OUT/sweep.log
  env "$@" JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
    timeout 1800 python tools/bench_scan.py --chained --bwd --stages $nst \
      --dtype bf16 --batch 24 2>/dev/null | tee -a $OUT/sweep.log
}

# single-variable sweeps on the two hot stages + deep-stage budget sweeps.
# The r3 defaults flipped to PINV=exp/ROWSEL=slice after this sweep ran, so
# every row now PINS its full operating point: "baseline" is the r2-default
# comparison point the r3 table was measured against.
run_bench baseline 4 FM_SCAN_PINV=div FM_SCAN_ROWSEL=mask
run_bench pinv_exp 2 FM_SCAN_PINV=exp FM_SCAN_ROWSEL=mask
run_bench rowsel_slice 2 FM_SCAN_PINV=div FM_SCAN_ROWSEL=slice
run_bench nloop_mm 2 FM_SCAN_PINV=div FM_SCAN_ROWSEL=mask FM_SCAN_NLOOP=mm
# T-tiling: budgets gate pairs-per-grid-cell; deep stages (L=64/16) run T=1
# with tiny per-cell work under the shipped 256K/128K element budgets
run_bench budget_1M_512K 4 FM_SCAN_FWD_BUDGET=1048576 FM_SCAN_BWD_BUDGET=524288
run_bench budget_2M_1M 4 FM_SCAN_FWD_BUDGET=2097152 FM_SCAN_BWD_BUDGET=1048576
run_bench dcap_384 4 FM_SCAN_DCAP=384
# chunk length: cumsum_mm's per-element cost is flat in l_chunk (the 128-row
# sub-blocked triangular dots and the VPU passes don't grow), so longer
# chunks only remove carry boundaries; VMEM is the binding constraint
# (bwd ~12 expanded arrays: L_CHUNK=512 x F=3072 x 12 x 4B ~ 75 MB)
run_bench lcap_512 2 FM_SCAN_LCAP=512
echo "[r3] sweep done $(date)" | tee -a $OUT/log

echo "==== bench_defaults" | tee -a $OUT/sweep.log
timeout 2400 python bench.py 2>/dev/null | tail -1 | tee $OUT/bench_defaults.json

echo "==== profile" | tee -a $OUT/log
timeout 2400 python tools/profile_step.py --batch 24 --dtype bf16 \
  --logdir /tmp/r3/profile > $OUT/profile.log 2>&1

echo "==== trajectory" | tee -a $OUT/log
timeout 5400 python tools/train_trajectory.py --steps 200 --batch 12 \
  --out $OUT/trajectory > $OUT/trajectory.log 2>&1
tail -20 $OUT/trajectory.log | tee -a $OUT/log

echo "[r3] ALL DONE $(date)" | tee -a $OUT/log
