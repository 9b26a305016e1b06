"""Round-5 fourth chip wave: full-model A/B of the take-based segment
gather, then the final headline re-run (and cache warm) at whatever
defaults the round ships.

Run after chip_queue_r5c.py drains and its microbench verdicts are read.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")

from chip_queue_r5 import main as queue_main
import chip_queue_r5 as q


q.STEPS = [
    ("bisect_femb", 2400,
     [sys.executable, "scripts/bisect_femb_v2.py"], {}),
    ("bench_take", 3500, [sys.executable, "bench.py"],
     {"SE3ET_SEG_GATHER": "take"}),
    ("bench_final", 3500, [sys.executable, "bench.py"], {}),
    ("bench_kitti_final", 3500, [sys.executable, "bench.py"],
     {"BENCH_EXP": "se3eti.kitti"}),
]

if __name__ == "__main__":
    queue_main(set(sys.argv[1:]))
