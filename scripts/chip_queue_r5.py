"""Round-5 chip work queue: polls the axon TPU relay, then runs the queued
measurements in sequence, one /tmp log per step.

Priorities (VERDICT r4): #2 the 1500-step production fused-train validation
(96 train / 48 val pairs, Wilson CI), #3 fresh per-stage backbone
attribution, #8 the BENCH_BATCH=2 A/B, #6 KITTI MFU re-measure.

Usage: python scripts/chip_queue_r5.py [step ...]   (default: all, in order)
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
    ("train_fused_val", 7200,
     [sys.executable, "scripts/train_synthetic_demo.py", "--exp",
      "se3eti.3dmatch", "--steps", "1500", "--train_pairs", "96",
      "--val_pairs", "48", "--val_every", "500"], {}),
    ("prefix", 2400, [sys.executable, "scripts/profile_prefix.py"], {}),
    ("bench_batch2", 3500, [sys.executable, "bench.py"],
     {"BENCH_BATCH": "2"}),
    ("bench_kitti", 3500, [sys.executable, "bench.py"],
     {"BENCH_EXP": "se3eti.kitti"}),
]


def probe() -> bool:
    """Cheap TPU liveness check in a subprocess (the relay blocks ~35 min
    before raising UNAVAILABLE — a 120 s timeout decides instead)."""
    code = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "print(jax.devices());"
        "print(np.asarray(jnp.sum(jnp.ones((8, 8)))))"
    )
    try:
        rc = subprocess.run(
            [sys.executable, "-c", code], timeout=120, cwd=ROOT,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode
    except subprocess.TimeoutExpired:
        return False
    return rc == 0


def wait_up():
    while not probe():
        print(f"[queue] tpu down at {time.strftime('%H:%M:%S')}, "
              "retrying in 120s", flush=True)
        time.sleep(120)
    print(f"[queue] TPU is up at {time.strftime('%H:%M:%S')}", flush=True)


def main(names):
    for name, tmo, argv, env in STEPS:
        if names and name not in names:
            continue
        # the relay flaps for hours at a time (round 3: >5h; round 5: three
        # outages in one evening) — re-probe before EVERY step so an outage
        # parks the queue instead of burning each step's full timeout
        wait_up()
        log = f"/tmp/{name}_r5.log"
        for attempt in (1, 2):
            print(f"[queue] {name} -> {log} (attempt {attempt})", flush=True)
            t0 = time.time()
            with open(log, "a" if attempt > 1 else "w") as f:
                try:
                    rc = subprocess.run(
                        argv, cwd=ROOT, stdout=f, stderr=subprocess.STDOUT,
                        timeout=tmo, env={**os.environ, **env},
                    ).returncode
                except subprocess.TimeoutExpired:
                    rc = 124
            print(f"[queue] {name}: rc={rc} ({time.time() - t0:.0f}s)",
                  flush=True)
            if rc == 0:
                break
            # a mid-step relay outage surfaces as a timeout or UNAVAILABLE
            # crash; park until the relay answers, then retry ONCE
            wait_up()
    print("[queue] done", flush=True)


if __name__ == "__main__":
    main(set(sys.argv[1:]))
