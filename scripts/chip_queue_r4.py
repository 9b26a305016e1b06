"""Round-4 chip work queue: sequential TPU measurements, one log per step.

Run AFTER the kernel diagnostics (probe_rpe_b2 / bisect_rpe_bwd).  Each step
tees to /tmp/<name>_r4.log; a step failure does not stop the queue.

Usage: python scripts/chip_queue_r4.py [step ...]   (default: all, in order)
"""

import os
import os.path as osp
import subprocess
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))

STEPS = [
    # (name, timeout_s, argv, extra_env)
    ("bench", 3500, [sys.executable, "bench.py"], {}),
    ("prefix", 2400, [sys.executable, "scripts/profile_prefix.py"], {}),
    ("write_floor", 1800,
     [sys.executable, "scripts/bench_write_floor.py"], {}),
    ("train_step", 3500,
     [sys.executable, "scripts/profile_train_step.py"], {}),
    ("bench_kitti", 3500, [sys.executable, "bench.py"],
     {"BENCH_EXP": "se3eti.kitti"}),
    ("train_fused_val", 5400,
     [sys.executable, "scripts/train_synthetic_demo.py", "--exp",
      "se3eti.3dmatch", "--steps", "1500", "--train_pairs", "96",
      "--val_pairs", "48"], {}),
]


def main(names):
    for name, tmo, argv, env in STEPS:
        if names and name not in names:
            continue
        log = f"/tmp/{name}_r4.log"
        print(f"[queue] {name} -> {log}", flush=True)
        t0 = time.time()
        with open(log, "w") as f:
            try:
                rc = subprocess.run(
                    argv, cwd=ROOT, stdout=f, stderr=subprocess.STDOUT,
                    timeout=tmo, env={**os.environ, **env},
                ).returncode
            except subprocess.TimeoutExpired:
                rc = 124
        print(f"[queue] {name}: rc={rc} ({time.time() - t0:.0f}s)",
              flush=True)
    print("[queue] done", flush=True)


if __name__ == "__main__":
    main(set(sys.argv[1:]))
