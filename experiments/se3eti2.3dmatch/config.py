"""Experiment config for se3eti2.3dmatch (reference: experiments/se3eti2.3dmatch/config.py)."""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), "..", ".."))

from se3et_tpu.experiments import make_cfg as _make_cfg

EXPERIMENT_NAME = "se3eti2.3dmatch"


def make_cfg():
    return _make_cfg(EXPERIMENT_NAME)
