"""Round-5 second chip wave: measurements for the changes landed after the
first wave started (per-set 8-row segments, femb v2 bn=32, kfirst sweep).

Run after chip_queue_r5.py drains.  Same structure: poll, then sequential
steps, one /tmp log each.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")

from chip_queue_r5 import main as queue_main
import chip_queue_r5 as q


q.STEPS = [
    # retry of VERDICT #2 with host-side val pairs (the 144-pyramid
    # device-resident build RESOURCE_EXHAUSTED the chip on the first wave)
    ("train_fused_val2", 7200,
     [sys.executable, "scripts/train_synthetic_demo.py", "--exp",
      "se3eti.3dmatch", "--steps", "1500", "--train_pairs", "96",
      "--val_pairs", "48", "--val_every", "500"], {}),
    ("compile_kernels", 2400,
     [sys.executable, "scripts/compile_kernels.py"], {}),
    ("bench_sseg", 3500, [sys.executable, "bench.py"], {}),
    ("bench_femb2", 3500, [sys.executable, "bench.py"],
     {"BENCH_FEMB": "1"}),
    ("wf_kfirst_lowac", 2400,
     [sys.executable, "scripts/bench_wf_hc.py", "--hcs", "auto"], {}),
]

if __name__ == "__main__":
    queue_main(set(sys.argv[1:]))
