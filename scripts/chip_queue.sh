#!/bin/bash
# Round-3 chip work queue: runs once the axon TPU tunnel is back.
# Probes first (cheap), then runs the queued measurements in sequence,
# teeing each to its own /tmp log.
set -u
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices())
print(np.asarray(jnp.sum(jnp.ones((8,8)))))
" > /tmp/probe.log 2>&1
}

echo "[queue] waiting for TPU..."
until probe; do
  echo "[queue] tpu down at $(date +%H:%M:%S), retrying in 120s"
  sleep 120
done
echo "[queue] TPU is up at $(date +%H:%M:%S)"

echo "[queue] 0: kernel compile smoke"
timeout 1800 python scripts/compile_kernels.py > /tmp/compile_kernels.log 2>&1
echo "exit=$?" >> /tmp/compile_kernels.log

echo "[queue] 1/3 kfirst microbench"
timeout 2400 python scripts/bench_wf_hc.py --hcs auto > /tmp/wf_kfirst.log 2>&1
echo "exit=$?" >> /tmp/wf_kfirst.log

echo "[queue] 2/3 full bench"
timeout 3500 python bench.py > /tmp/bench_r3.log 2>&1
echo "exit=$?" >> /tmp/bench_r3.log

echo "[queue] 3/3 prefix attribution"
timeout 2400 python scripts/profile_prefix.py > /tmp/prefix_r3.log 2>&1
echo "exit=$?" >> /tmp/prefix_r3.log

echo "[queue] done"

echo "[queue] 4/5 train step (custom-VJP fused convs)"
timeout 3500 python scripts/profile_train_step.py > /tmp/train_step_r3.log 2>&1
echo "exit=$?" >> /tmp/train_step_r3.log

echo "[queue] 5/5 write floor probe"
timeout 1800 python scripts/bench_write_floor.py > /tmp/write_floor.log 2>&1
echo "exit=$?" >> /tmp/write_floor.log
echo "[queue] all done"

echo "[queue] 6/6 KITTI 5-stage bench entry"
timeout 3500 env BENCH_EXP=se3eti.kitti python bench.py > /tmp/bench_kitti.log 2>&1
echo "exit=$?" >> /tmp/bench_kitti.log
echo "[queue] fully done"

echo "[queue] 7: fused-training quality re-validation (se3eti.3dmatch, 1500 steps)"
timeout 3500 python scripts/train_synthetic_demo.py --exp se3eti.3dmatch \
  --steps 1500 --train_pairs 96 --val_pairs 12 > /tmp/train_fused_val.log 2>&1
echo "exit=$?" >> /tmp/train_fused_val.log
echo "[queue] queue complete"
