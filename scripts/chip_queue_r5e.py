"""Round-5 fifth chip wave, after the seg-gather microbench verdict:

* bench_auto     — headline at the new per-shape gather default (vs 68.1)
* bench_sseg4    — contingent arm: 4-row segments on stage-1/2 sets
                   (W cuts 17-25%; affordable only under the row gather)
* prefix_backbone / profile_backbone_pieces — fresh per-stage attribution
* bisect_femb2   — bm=64/256 probes at bn=32 (is the Mosaic crash
                   footprint-driven?)
* bench_femb16   — femb v2 at the bn=16 fallback tile
* prefix_kitti   — KITTI attribution
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")

from chip_queue_r5 import main as queue_main
import chip_queue_r5 as q


q.STEPS = [
    ("bench_auto", 3500, [sys.executable, "bench.py"], {}),
    ("bench_sseg4", 3500, [sys.executable, "bench.py"],
     {"BENCH_SSEG4": "1"}),
    ("prefix_backbone", 3500,
     [sys.executable, "scripts/profile_prefix.py", "--backbone"], {}),
    ("profile_backbone_pieces", 3500,
     [sys.executable, "scripts/profile_backbone.py"], {}),
    ("bisect_femb2", 2400,
     [sys.executable, "scripts/bisect_femb_v2.py"], {}),
    ("bench_femb16", 3500, [sys.executable, "bench.py"],
     {"BENCH_FEMB": "1"}),
    ("prefix_kitti", 2400,
     [sys.executable, "scripts/profile_prefix.py", "--exp", "se3eti.kitti"],
     {}),
]

if __name__ == "__main__":
    queue_main(set(sys.argv[1:]))
