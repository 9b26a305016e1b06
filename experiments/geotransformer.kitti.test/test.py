"""Feature extraction / testing for geotransformer.kitti.test (reference: experiments/geotransformer.kitti.test/test.py)."""

import sys

from config import make_cfg  # noqa: E402

from se3et_tpu.experiments.runner import run_test


def main():
    run_test(make_cfg(), sys.argv[1:])


if __name__ == "__main__":
    main()
