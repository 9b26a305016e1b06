"""Experiment config for geotransformer.kitti.generalization_test (reference: experiments/geotransformer.kitti.generalization_test/config.py)."""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), "..", ".."))

from se3et_tpu.experiments import make_cfg as _make_cfg

EXPERIMENT_NAME = "geotransformer.kitti.generalization_test"


def make_cfg():
    return _make_cfg(EXPERIMENT_NAME)
