#!/bin/bash
# Round-3 measurement queue: waits for the TPU tunnel to serve again, then
# runs the kernel-variant sweep (Pinv div/exp, rowsel mask/slice), the
# device-op profile, and the end-to-end bench. Results land in /tmp/r3/.
set -u
OUT=/tmp/r3
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
  sleep 180
done

run_bench() {  # name, env...
  local name=$1; shift
  echo "==== $name" | tee -a $OUT/sweep.log
  env "$@" JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
    timeout 1800 python tools/bench_scan.py --chained --bwd --stages 2 \
      --dtype bf16 --batch 24 2>/dev/null | tee -a $OUT/sweep.log
}

run_bench baseline FM_DUMMY=1
run_bench pinv_exp FM_SCAN_PINV=exp
run_bench rowsel_slice FM_SCAN_ROWSEL=slice
run_bench pinv_exp_rowsel_slice FM_SCAN_PINV=exp FM_SCAN_ROWSEL=slice
run_bench abl_pinv FM_SCAN_ABLATE=pinv
run_bench floor FM_SCAN_ABLATE=pinv,recompute,rev,daa,loop,graddots,build

echo "[r3] sweep done $(date)" | tee -a $OUT/log
