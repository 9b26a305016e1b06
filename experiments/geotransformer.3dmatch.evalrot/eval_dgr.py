"""Pairwise-acceptance evaluation for geotransformer.3dmatch.evalrot over the same feature dumps
(reference: experiments/geotransformer.3dmatch.evalrot/eval_dgr.py — RRE/RTE-threshold RR)."""

import sys

from config import make_cfg  # noqa: E402

from se3et_tpu.experiments.runner import run_eval_dgr


def main():
    run_eval_dgr(make_cfg(), sys.argv[1:])


if __name__ == "__main__":
    main()
