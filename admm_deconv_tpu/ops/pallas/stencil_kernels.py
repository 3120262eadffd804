"""Fused whole-stencil ADMM step: D, prox, dual ascent, and D^T in ONE pass.

Motivation (measured on TPU v5e, 12x1080x1920 fp32, `scripts/perf_decompose.py`):
the solver's per-iteration cost splits into ~7.9 ms of MXU DFT matmuls
(near compute-bound) and ~4.2 ms of spatial/elementwise stencil work whose
pure HBM traffic is only ~1.3 ms — the gap is per-op dispatch overhead and
intermediate materialization across the jnp composition (rolls, prox, dual,
adjoint each touching HBM).  This kernel computes, per row-block and in a
single VMEM pass:

    dx   = D x                       (circular backward differences)
    v    = dx + u
    z    = prox(v, tau)              (aniso | iso | hard | gauss)
    u'   = v - z                     (scaled dual ascent)
    q    = D^T (z - u')              (adjoint — the next x-update's rhs)

returning ``(q, ux', uy')``.  ``z`` never exists in HBM: with plain ADMM
(alpha = 1) the iteration state is fully described by ``(q, u)``, so the
solver's scan carry drops from 5 planes to 3 and each iteration's non-DFT
part becomes 3 reads + 3 writes (see ``ops/solver.py``'s fast path).

Halo handling: the grid is (planes, H/block) with W kept whole, so the two
circular W-rolls stay inside the block; the H-direction needs one row above
(for ``D_y x``) and one row below (the adjoint consumes ``w[i+1]``, and
``w`` depends pointwise on x/ux/uy one row down).  Neighbor rows are read by
passing the same operands again under block-index maps shifted by ±1 mod
G — a 1-row-per-block redundant read, costing far less than a separate XLA
roll materialization.

The reference runs this section as 5+ separate CUDA broadcast/conv kernels
(``src/ops/ops.jl:86-91``).  Not differentiable (no custom VJP): the solver
uses it only on the non-autodiff path (``prox_impl="pallas"``); the jnp
composition remains the gradient/reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12

# Per-buffer VMEM block budget (bytes). 10 pipelined block buffers (7 in,
# 3 out, double-buffered) plus kernel intermediates must fit ~16 MB.
_BLOCK_BYTES = 512 * 1024


def _pick_block_rows(h: int, w: int, itemsize: int = 4) -> int | None:
    """Largest divisor of ``h`` that is a multiple of 8 and fits the
    per-buffer budget; None if no usable block exists."""
    best = None
    for bm in range(8, h + 1, 8):
        if h % bm == 0 and bm * w * itemsize <= _BLOCK_BYTES:
            best = bm
    return best


def _prox(mode, vx, vy, tau):
    if mode == "aniso":
        zx = jnp.sign(vx) * jnp.maximum(jnp.abs(vx) - tau, 0.0)
        zy = jnp.sign(vy) * jnp.maximum(jnp.abs(vy) - tau, 0.0)
    elif mode == "iso":
        r = jnp.sqrt(vx * vx + vy * vy)
        scale = jnp.maximum(1.0 - tau / jnp.maximum(r, _EPS), 0.0)
        zx, zy = scale * vx, scale * vy
    elif mode == "hard":
        zx = vx * (jnp.abs(vx) > tau)
        zy = vy * (jnp.abs(vy) > tau)
    elif mode == "gauss":
        r2 = vx * vx + vy * vy
        scale = 0.5 - 0.5 * jnp.exp(-r2 / (2.0 * tau * tau))
        zx, zy = scale * vx, scale * vy
    else:  # pragma: no cover - guarded by caller
        raise ValueError(f"unknown prox mode {mode!r}")
    return zx, zy


def _kernel(
    mode,
    tau_ref,
    xp_ref,
    xc_ref,
    xn_ref,
    uxc_ref,
    uxn_ref,
    uyc_ref,
    uyn_ref,
    q_ref,
    uxo_ref,
    uyo_ref,
):
    tau = tau_ref[0, 0]
    xc = xc_ref[0]  # (BM, W) rows [r0, r1)
    # Extended x rows [r0-1, r1]: last row of the block above, the block,
    # first row of the block below (index maps wrap mod G -> exact circular).
    x_ext = jnp.concatenate([xp_ref[0, -1:], xc, xn_ref[0, :1]], axis=0)
    x_lo = x_ext[1:]  # rows [r0, r1] — (BM+1, W)
    dxy = x_lo - x_ext[:-1]
    dxx = x_lo - pltpu.roll(x_lo, 1, axis=1)
    ux_e = jnp.concatenate([uxc_ref[0], uxn_ref[0, :1]], axis=0)
    uy_e = jnp.concatenate([uyc_ref[0], uyn_ref[0, :1]], axis=0)
    vx = dxx + ux_e
    vy = dxy + uy_e
    zx, zy = _prox(mode, vx, vy, tau)
    ux_new = vx - zx
    uy_new = vy - zy
    wx = zx - ux_new  # = 2 z - v, the next rhs's spatial argument
    wy = zy - uy_new
    wx0 = wx[:-1]
    # pltpu.roll requires a non-negative shift: roll by W-1 == roll by -1.
    q_ref[0] = (wx0 - pltpu.roll(wx0, wx0.shape[1] - 1, axis=1)) + (wy[:-1] - wy[1:])
    uxo_ref[0] = ux_new[:-1]
    uyo_ref[0] = uy_new[:-1]


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def fused_admm_stencil(
    x: jnp.ndarray,
    ux: jnp.ndarray,
    uy: jnp.ndarray,
    tau,
    mode: str = "aniso",
    interpret: bool = False,
):
    """One-pass D -> prox -> dual -> D^T over ``(N, H, W)`` planes.

    Semantically identical to::

        dxx, dxy = grad2d(x)
        zx, zy, ux2, uy2 = prox_dual_step(dxx, dxy, ux, uy, tau, prox)
        q = grad2d_adjoint(zx - ux2, zy - uy2)
        return q, ux2, uy2

    for scalar ``tau`` and plain ADMM (no over-relaxation).  Raises
    ``ValueError`` when no valid row block exists (caller falls back to the
    jnp composition).

    Returns ``(q, ux_new, uy_new)``.
    """
    if x.ndim != 3:
        raise ValueError(f"expected (N, H, W), got {x.shape}")
    n, h, w = x.shape
    bm = _pick_block_rows(h, w, x.dtype.itemsize)
    if bm is None:
        raise ValueError(f"no usable row block for H={h}, W={w}")
    g = h // bm

    tau_arr = jnp.asarray(tau, x.dtype).reshape(1, 1)
    grid = (n, g)
    blk = lambda off: pl.BlockSpec(  # noqa: E731
        (1, bm, w), lambda i, j, o=off: (i, (j + o) % g, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n, h, w), x.dtype)

    q, ux2, uy2 = pl.pallas_call(
        functools.partial(_kernel, mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(-1),  # x, block above
            blk(0),  # x
            blk(1),  # x, block below
            blk(0),  # ux
            blk(1),  # ux, block below
            blk(0),  # uy
            blk(1),  # uy, block below
        ],
        out_specs=(blk(0), blk(0), blk(0)),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(tau_arr, x, x, x, ux, ux, uy, uy)
    return q, ux2, uy2
