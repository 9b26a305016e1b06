"""Train + validate geotransformer.kitti.generalization_test (reference: experiments/geotransformer.kitti.generalization_test/trainval.py)."""

import sys

from config import make_cfg  # noqa: E402

from se3et_tpu.experiments.runner import run_trainval


def main():
    run_trainval(make_cfg(), sys.argv[1:])


if __name__ == "__main__":
    main()
