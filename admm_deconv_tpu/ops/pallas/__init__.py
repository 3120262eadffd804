"""Pallas TPU kernels for the solver's memory-bound hot ops."""

from admm_deconv_tpu.ops.pallas.prox_kernels import fused_prox_dual

__all__ = ["fused_prox_dual"]
