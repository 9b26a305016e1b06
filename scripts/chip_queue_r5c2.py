"""Round-5 third wave, reordered after the compile smoke: femb eq STILL
crashes Mosaic post-622632c (bf16 out/max), so bench_femb3 is pointless —
bisect the crash axis instead, then run the attribution steps.

compile_kernels2 already ran (12 OK / femb-eq FAIL, /tmp/compile_kernels2_r5.log).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")

from chip_queue_r5 import main as queue_main
import chip_queue_r5 as q


q.STEPS = [
    ("bisect_femb", 2400,
     [sys.executable, "scripts/bisect_femb_v2.py"], {}),
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
