from se3et_tpu.experiments.configs import EXPERIMENTS, ExperimentConfig, make_cfg

__all__ = ["EXPERIMENTS", "ExperimentConfig", "make_cfg"]
