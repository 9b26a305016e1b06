"""Single-pair demo for geotransformer.kitti.test incl. rotated-src equivariance check
(reference: experiments/geotransformer.kitti.test/demo.py)."""

import sys

from config import make_cfg  # noqa: E402

from se3et_tpu.experiments.runner import run_demo


def main():
    run_demo(make_cfg(), sys.argv[1:])


if __name__ == "__main__":
    main()
