"""Round-5 third chip wave: fine-grained attribution to target the last
backbone/transformer milliseconds (VERDICT r4 #3).

Run after chip_queue_r5b.py drains.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")

from chip_queue_r5 import main as queue_main
import chip_queue_r5 as q


q.STEPS = [
    # femb retry after the bf16-output/bf16-max VMEM fixes (622632c)
    ("compile_kernels2", 2400,
     [sys.executable, "scripts/compile_kernels.py"], {}),
    ("bench_femb3", 3500, [sys.executable, "bench.py"],
     {"BENCH_FEMB": "1"}),
    ("seg_gather", 2400,
     [sys.executable, "scripts/bench_seg_gather.py"], {}),
    ("prefix_backbone", 3500,
     [sys.executable, "scripts/profile_prefix.py", "--backbone"], {}),
    ("profile_backbone_pieces", 3500,
     [sys.executable, "scripts/profile_backbone.py"], {}),
    ("prefix_kitti", 2400,
     [sys.executable, "scripts/profile_prefix.py", "--exp", "se3eti.kitti"],
     {}),
]

if __name__ == "__main__":
    queue_main(set(sys.argv[1:]))
