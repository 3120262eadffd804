"""Pallas TPU kernels for the solver's memory-bound hot ops."""

from admm_deconv_tpu.ops.pallas.prox_kernels import fused_prox_dual
from admm_deconv_tpu.ops.pallas.stencil_kernels import fused_admm_stencil

__all__ = ["fused_prox_dual", "fused_admm_stencil"]
