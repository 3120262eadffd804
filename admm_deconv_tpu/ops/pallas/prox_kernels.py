"""Fused z-update + dual-ascent Pallas TPU kernel.

The ADMM iteration's non-FFT tail — ``v = Dx + u``, ``z = prox(v, tau)``,
``u' = v - z`` over the gradient pair — is pure elementwise over 4 input
and 4 output arrays (the reference runs it as separate CUDA broadcast
kernels, ``src/ops/ops.jl:89-91``).  This kernel performs the whole tail in
one VMEM pass per block: 8 HBM streams total, no intermediates, both
gradient components together (required for the isotropic prox, which couples
them through the per-pixel magnitude).

``tau`` may be a scalar or a per-plane ``(N,)`` vector (inputs then must be
``(N, H, W)``); the kernel indexes the SMEM tau vector by the plane grid
axis.  The op is differentiable via a ``jax.custom_vjp`` whose backward is
the analytic jnp expression (pure elementwise — XLA fuses it; the fused
*stencil* kernel in ``stencil_kernels.py`` is the hot training path and has
its own Pallas backward).

The jnp composition in :mod:`admm_deconv_tpu.ops.prox` remains the reference
implementation; select this kernel with ``prox_impl="pallas"`` in the solver.

Measured note (TPU v5e, 12x1080x1920 fp32): the kernel itself is efficient,
but at this granularity XLA already fuses the jnp composition with the
surrounding roll stencils, so forcing a ``pallas_call`` boundary costs
slightly more than it saves (~589 vs ~569 ms per 50-iter solve).  The
default therefore stays ``prox_impl="xla"``; the kernel remains for larger
fusion scopes and as the Pallas reference for this op family.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from admm_deconv_tpu.ops.pallas.prox_math import MODES, prox_apply, prox_vjp
from admm_deconv_tpu.ops.pallas.stencil_kernels import (
    _default_interpret,
    _tau_plane_vector,
)

# Rows per grid step: 8 f32 buffers x BLOCK_M x 128-lane-padded W, double
# buffered, PLUS ~4 in-kernel temporaries must fit the ~16 MB VMEM budget
# (64 x 1920 x 4 B x 8 x 2 = 7.9 MB streams + ~2 MB stack).  The row count
# scales inversely with row bytes: a fixed 64 rows at W=3840 allocates
# 18.75 MB of kernel stack and fails Mosaic's scoped-vmem check at 4K.
_BLOCK_M = 64


def _block_rows(w: int, itemsize: int) -> int:
    """Per-block row count budgeted by row bytes (64 rows at W=1920/f32,
    scaled down for wider rows, floor 8, multiple of 8)."""
    rows = (_BLOCK_M * 1920 * 4) // (w * itemsize)
    return max(8, (rows // 8) * 8)


def _kernel(mode, per_plane, tau_ref, dxx_ref, dxy_ref, ux_ref, uy_ref,
            zx_ref, zy_ref, uxo_ref, uyo_ref):
    tau = tau_ref[pl.program_id(0) if per_plane else 0, 0]
    vx = dxx_ref[...] + ux_ref[...]
    vy = dxy_ref[...] + uy_ref[...]
    zx, zy = prox_apply(mode, vx, vy, tau)
    zx_ref[...] = zx
    zy_ref[...] = zy
    uxo_ref[...] = vx - zx
    uyo_ref[...] = vy - zy


def _prox_dual_pallas(dxx, dxy, ux, uy, tau_c, mode, interpret):
    per_plane = jnp.ndim(tau_c) > 0
    orig_shape = dxx.shape
    w = orig_shape[-1]

    if per_plane:
        n, h = orig_shape[0], 1
        for d in orig_shape[1:-1]:
            h *= d
        shape = (n, h, w)
        tau_arr = tau_c.reshape(n, 1)
        bm = min(_block_rows(w, dxx.dtype.itemsize), h)
        grid = (n, pl.cdiv(h, bm))
        tile = pl.BlockSpec((1, bm, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(shape, dxx.dtype)
    else:
        m = 1
        for d in orig_shape[:-1]:
            m *= d
        shape = (m, w)
        tau_arr = tau_c.reshape(1, 1)
        bm = min(_block_rows(w, dxx.dtype.itemsize), m)
        grid = (pl.cdiv(m, bm),)
        tile = pl.BlockSpec((bm, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(shape, dxx.dtype)

    def flat(a):
        return a.reshape(shape)

    zx, zy, uxo, uyo = pl.pallas_call(
        functools.partial(_kernel, mode, per_plane),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile,
            tile,
            tile,
            tile,
        ],
        out_specs=(tile, tile, tile, tile),
        out_shape=(out_shape, out_shape, out_shape, out_shape),
        interpret=interpret,
    )(tau_arr, flat(dxx), flat(dxy), flat(ux), flat(uy))

    return (
        zx.reshape(orig_shape),
        zy.reshape(orig_shape),
        uxo.reshape(orig_shape),
        uyo.reshape(orig_shape),
    )


@functools.lru_cache(maxsize=None)
def _make_diff_prox_dual(mode: str, interpret: bool):
    @jax.custom_vjp
    def f(dxx, dxy, ux, uy, tau):
        return _prox_dual_pallas(dxx, dxy, ux, uy, tau, mode, interpret)

    def fwd(dxx, dxy, ux, uy, tau):
        return f(dxx, dxy, ux, uy, tau), (dxx, dxy, ux, uy, tau)

    def bwd(res, cts):
        dxx, dxy, ux, uy, tau = res
        gzx, gzy, gux, guy = cts
        tau_b = tau if jnp.ndim(tau) == 0 else tau.reshape(
            (-1,) + (1,) * (dxx.ndim - 1)
        )
        vx, vy = dxx + ux, dxy + uy
        # z gets -gu through u' = v - z; v gets +gu directly.
        zbx = gzx - gux
        zby = gzy - guy
        pvx, pvy, taub = prox_vjp(mode, vx, vy, tau_b, zbx, zby)
        vbx = gux + pvx
        vby = guy + pvy
        if jnp.ndim(tau) == 0:
            taub_sum = jnp.sum(taub)
        else:
            taub_sum = jnp.sum(taub.reshape(tau.shape[0], -1), axis=1)
        return vbx, vby, vbx, vby, taub_sum.astype(jnp.asarray(tau).dtype)

    f.defvjp(fwd, bwd)
    return f


def fused_prox_dual(
    dxx: jnp.ndarray,
    dxy: jnp.ndarray,
    ux: jnp.ndarray,
    uy: jnp.ndarray,
    tau,
    mode: str = "aniso",
    interpret: bool | None = None,
):
    """One-pass fused prox + dual ascent (differentiable).

    Semantically identical to
    :func:`admm_deconv_tpu.ops.prox.prox_dual_step` with the matching
    operator.  ``tau`` is a scalar (arbitrary leading shape; arrays viewed as
    (rows, W) and blocked over rows) or per-plane ``(N,)`` / ``(N,1,1)``
    (arrays must then lead with the plane axis).  ``interpret=None``
    auto-enables interpreter mode on CPU backends.

    Returns ``(zx, zy, ux_new, uy_new)``.
    """
    if mode not in MODES:
        raise ValueError(f"unknown prox mode {mode!r}; expected one of {MODES}")
    tau_c = _tau_plane_vector(tau, dxx.shape[0], dxx.dtype)
    if tau_c is None:
        raise ValueError(
            f"tau shape {jnp.shape(tau)} not scalar or per-plane ({dxx.shape[0]},)"
        )
    return _make_diff_prox_dual(mode, _default_interpret(interpret))(
        dxx, dxy, ux, uy, tau_c
    )
