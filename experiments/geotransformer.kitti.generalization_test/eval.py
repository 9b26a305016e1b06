"""Benchmark evaluation for geotransformer.kitti.generalization_test (reference: experiments/geotransformer.kitti.generalization_test/eval.py)."""

import sys

from config import make_cfg  # noqa: E402

from se3et_tpu.experiments.runner import run_eval


def main():
    run_eval(make_cfg(), sys.argv[1:])


if __name__ == "__main__":
    main()
