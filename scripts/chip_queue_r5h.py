"""Round-5 eighth chip wave: fresh attribution at the final (wf_mm ON)
default tree — per-section prefix split, per-stage backbone split, and the
backbone piece microbenches.  Read-only w.r.t. the default tree (no knob
flips), so the driver's warmed .jax_cache stays valid.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")

from chip_queue_r5 import main as queue_main
import chip_queue_r5 as q


q.STEPS = [
    ("prefix_wfmm", 3500,
     [sys.executable, "scripts/profile_prefix.py"], {}),
    ("prefix_backbone_wfmm", 3500,
     [sys.executable, "scripts/profile_prefix.py", "--backbone"], {}),
    ("pieces_wfmm", 3500,
     [sys.executable, "scripts/profile_backbone.py"], {}),
]

if __name__ == "__main__":
    queue_main(set(sys.argv[1:]))
