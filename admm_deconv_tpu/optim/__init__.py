"""Optimizer schedules: reduce-LR-on-plateau over optax."""

from admm_deconv_tpu.optim.plateau import ReduceLROnPlateau

__all__ = ["ReduceLROnPlateau"]
