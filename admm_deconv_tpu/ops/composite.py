"""Composite-prior ADMM deconvolution: TV + L1 + box (two splittings).

BASELINE config 3 capability ("L1+TV composite prior") with no reference
counterpart: solve

    min_x  0.5*||H x - y||^2 + lam_tv*||D x||  + lam_l1*||x||_1
                                              (+ indicator of [lo, hi])

by ADMM with two split variables: ``z1 = D x`` (TV prox, as in the core
solver) and ``z2 = x`` (elementwise prox of ``lam_l1*|.|_1 + box``, which is
exactly ``clip(soft(v, lam_l1/rho2), lo, hi)``).  The x-update stays a
single closed-form rFFT division with denominator
``|Sigma|^2 + rho1*|Lambda|^2 + rho2`` — same 2 FFTs per iteration as the
pure-TV loop.

Returns the feasible/sparse iterate ``z2`` (it satisfies the box constraint
exactly and carries the L1 shrinkage); at convergence ``x == z2``.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from admm_deconv_tpu.ops import prox as prox_lib
from admm_deconv_tpu.ops.diff import grad2d, grad2d_adjoint
from admm_deconv_tpu.ops.solver import (
    _FFT_MODES,
    _normalize_input,
    _prepare,
    _solve_spectral,
    _unfold,
)


@functools.partial(
    jax.jit,
    static_argnames=("iters", "prox", "x_bounds", "fft_mode", "remat"),
)
def composite_tv_deconvolve(
    y: jnp.ndarray,
    psf: jnp.ndarray | None = None,
    lam_tv=0.01,
    lam_l1=0.0,
    rho1=0.1,
    rho2=0.1,
    iters: int = 100,
    prox: str | Callable = "aniso",
    x_bounds: tuple[float, float] | None = None,
    fft_mode: str = "xla",
    remat: bool = False,
):
    """ADMM with a TV + L1 + box composite prior (differentiable).

    Args:
      y: degraded image(s), NHWC (or 2-D/3-D variants).
      psf: blur kernel or None for denoising.
      lam_tv: TV weight; ``prox`` selects aniso/iso (as in the core solver).
      lam_l1: elementwise sparsity weight (0 disables shrinkage but keeps
        the projection split when ``x_bounds`` is given).
      rho1 / rho2: penalties of the gradient and identity splittings.
      x_bounds: exact box constraint enforced through the z2 prox.

    Returns the restored image(s) (the feasible ``z2`` iterate).
    """
    if fft_mode not in _FFT_MODES:
        raise ValueError(f"fft_mode must be one of {_FFT_MODES}, got {fft_mode!r}")
    tv_prox = prox_lib.resolve(prox)
    y = jnp.asarray(y)
    _, orig_shape = _normalize_input(y)
    y_f, b_f, denom_h, lap, lam_f, rho1_f, (b, h, w, c) = _prepare(
        y, psf, lam_tv, rho1, fft_mode
    )
    rho2_f = jnp.asarray(rho2, y_f.dtype)
    tau_tv = lam_f / rho1_f
    tau_l1 = jnp.asarray(lam_l1, y_f.dtype) / rho2_f
    # Identity-split penalty adds rho2 to the Wiener denominator.
    c_spec = 1.0 / (denom_h + rho1_f * lap + rho2_f)
    if fft_mode in ("fold", "fold_precise"):
        from admm_deconv_tpu.ops.fft_mxu import fold_even_odd

        c_spec = fold_even_odd(c_spec)
    elif fft_mode == "fold1":
        # Delta-form precompute (ops/solver.py fold1): x_B once exactly,
        # rho1*C folded for the bf16x1 loop matmuls — valid since both
        # penalties are fixed for the whole solve.
        from admm_deconv_tpu.ops.fft_mxu import fold_even_odd

        x_b = jnp.fft.irfft2(c_spec * b_f, s=(h, w))
        c_spec = fold_even_odd(rho1_f * c_spec)
        b_f = x_b

    lo, hi = (None, None) if x_bounds is None else x_bounds

    n = b * c
    zeros = jnp.zeros((n, h, w), dtype=y_f.dtype)

    def body(carry, _):
        z1x, z1y, u1x, u1y, z2, u2 = carry
        # x-update solves (H^T H + rho1 D^T D + rho2 I) x =
        #   H^T y + rho1 D^T(z1-u1) + rho2 (z2-u2).
        # The identity term rides the same transform: fold it into q so that
        # rho1*q = rho1*D^T(...) + rho2*(z2-u2), then reuse the core
        # spectral solve with the rho2-augmented denominator.
        q = grad2d_adjoint(z1x - u1x, z1y - u1y) + (rho2_f / rho1_f) * (z2 - u2)
        x = _solve_spectral(b_f, c_spec, rho1_f, q, h, w, fft_mode)

        # TV split.
        dxx, dxy = grad2d(x)
        z1x_n, z1y_n, u1x_n, u1y_n = prox_lib.prox_dual_step(
            dxx, dxy, u1x, u1y, tau_tv, tv_prox
        )
        # Identity split: prox of lam_l1*|.|_1 + box = clip(soft(v)).
        v = x + u2
        z2_n = jnp.sign(v) * jnp.maximum(jnp.abs(v) - tau_l1, 0.0)
        if x_bounds is not None:
            z2_n = jnp.clip(z2_n, lo, hi)
        u2_n = v - z2_n
        return (z1x_n, z1y_n, u1x_n, u1y_n, z2_n, u2_n), None

    if remat:
        body = jax.checkpoint(body)

    init = (zeros, zeros, zeros, zeros, zeros, zeros)
    (z1x, z1y, u1x, u1y, z2, u2), _ = jax.lax.scan(body, init, None, length=iters)
    return _unfold(z2, b, c).reshape(orig_shape)
