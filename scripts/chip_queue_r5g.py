"""Round-5 seventh chip wave: validate + measure the matmul-fused conv
kernel (windowed_gather_wf_mm — serving default ON; SE3ET_WF_MM=off is the
A/B control, measured 67.2 ms at the r5f tree).  Benches also re-warm
.jax_cache for the driver's end-of-round bench of the final tree.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/scripts")

from chip_queue_r5 import main as queue_main
import chip_queue_r5 as q


q.STEPS = [
    ("compile_kernels4", 2400,
     [sys.executable, "scripts/compile_kernels.py"], {}),
    ("bench_wfmm", 3500, [sys.executable, "bench.py"], {}),
    ("bench_kitti_wfmm", 3500, [sys.executable, "bench.py"],
     {"BENCH_EXP": "se3eti.kitti"}),
]

if __name__ == "__main__":
    queue_main(set(sys.argv[1:]))
