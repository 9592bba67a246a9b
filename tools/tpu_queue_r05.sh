#!/bin/bash
# Round-5 serial TPU validation queue (one TPU client at a time,
# CLAUDE.md). Run AFTER the CHA1_BENCH_FORCE=1 warm bench has finished —
# every validator below reuses programs that run warms (plus its own
# small ones). Results land in the committed evidence/ directory.
# Usage: nohup bash tools/tpu_queue_r05.sh > /tmp/tpu_queue_r05.log 2>&1 &
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

echo "[$(date -u +%H:%M:%S)] dense fused-gather validator (MC-calibrated gate)"
timeout 10800 python tools/tpu_validate_fused_gather.py \
  > evidence/tpu_validate_fused_gather_r5.json 2> /tmp/val_gather_r5.err
echo "fused_gather rc=$?"

echo "[$(date -u +%H:%M:%S)] sharded-fused compositions (interpret=False, 1-device mesh)"
timeout 10800 python tools/tpu_validate_sharded_fused.py \
  > evidence/tpu_validate_sharded_fused_r5.json 2> /tmp/val_sharded_r5.err
echo "sharded_fused rc=$?"

echo "[$(date -u +%H:%M:%S)] fused-multi validator (GOTHAM kernel record)"
timeout 7200 python tools/tpu_validate_fused_multi.py \
  > evidence/tpu_validate_fused_multi_r5.json 2> /tmp/val_multi_r5.err
echo "fused_multi rc=$?"

echo "[$(date -u +%H:%M:%S)] queue done"
