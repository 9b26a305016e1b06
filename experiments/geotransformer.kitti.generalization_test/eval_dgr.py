"""Pairwise-acceptance evaluation for geotransformer.kitti.generalization_test over the same feature dumps
(reference: experiments/geotransformer.kitti.generalization_test/eval_dgr.py — RRE/RTE-threshold RR)."""

import sys

from config import make_cfg  # noqa: E402

from se3et_tpu.experiments.runner import run_eval_dgr


def main():
    run_eval_dgr(make_cfg(), sys.argv[1:])


if __name__ == "__main__":
    main()
