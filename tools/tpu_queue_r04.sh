#!/bin/bash
# Round-4 wait-then-measure queue (CLAUDE.md "Relay outages" pattern):
# probe the backend with a trivial jit every ~2 min; on success run the
# queued TPU workloads serially in ONE process-reuse-friendly order.
# Usage: nohup bash tools/tpu_queue_r04.sh > results/tpu_queue_r04.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=axon

probe() {
  timeout 300 python - <<'PY'
import time, jax, jax.numpy as jnp
t0 = time.time()
x = jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((128, 128))).block_until_ready()
print(f"probe ok {time.time()-t0:.1f}s")
PY
}

until probe; do
  echo "[$(date -u +%H:%M:%S)] backend unavailable; retrying in 120s"
  sleep 120
done

echo "[$(date -u +%H:%M:%S)] backend up — running validation"
timeout 10800 python tools/tpu_validate_fused_gather.py \
  > results/tpu_validate_fused_gather.log 2>&1
echo "validate rc=$?"
tail -c 2000 results/tpu_validate_fused_gather.log

echo "[$(date -u +%H:%M:%S)] dense full fit (10k steps)"
timeout 7200 python tools/dense_full_fit.py fit \
  > results/dense_full_fit.log 2>&1
echo "dense fit rc=$?"
tail -c 2000 results/dense_full_fit.log
