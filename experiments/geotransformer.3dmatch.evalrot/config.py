"""Experiment config for geotransformer.3dmatch.evalrot (reference: experiments/geotransformer.3dmatch.evalrot/config.py)."""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), "..", ".."))

from se3et_tpu.experiments import make_cfg as _make_cfg

EXPERIMENT_NAME = "geotransformer.3dmatch.evalrot"


def make_cfg():
    return _make_cfg(EXPERIMENT_NAME)
