"""Spatially-tiled ADMM deconvolution across a device mesh (exact).

BASELINE config 5 capability: a single frame too large (or too numerous) for
one chip is sharded along its H axis over a ``tile`` mesh axis.  The
per-iteration pipeline runs fully distributed:

* **x-update** — an *exact* distributed rFFT2 by transpose decomposition:
  local rFFT along the (unsharded) W axis, an ``all_to_all`` that re-shards
  from H-tiles to frequency-column groups, a local full-length FFT along H,
  the Wiener-type elementwise solve against column-sharded cached spectra,
  then the inverse path.  Two ``all_to_all`` collectives per iteration, both
  riding ICI.  (SURVEY.md §7 lists distributed 2-D rFFT as the hard part;
  the transpose method avoids any halo/overlap approximation.)
* **D / D^T stencils** — circular 1-pixel halo exchange between neighbor
  tiles via ``ppermute`` (the tile partition is circular, matching the
  operators' circular boundary).
* **residual norms** — ``psum`` over the tile axis, so adaptive rho and
  stopping decisions are *shared* across tiles (consensus), identical to the
  single-chip solve.

The result is numerically identical to :func:`admm_deconv_tpu.ops.solver.
tv_deconvolve` on the gathered image (up to FFT rounding).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from admm_deconv_tpu.ops import prox as prox_lib
from admm_deconv_tpu.ops.fft import laplacian_spectrum, psf_to_otf
from admm_deconv_tpu.ops.fft_mxu import (
    _w_fwd,
    _w_inv,
    fold_even_odd,
    fold_hermitian,
    spectral_scale_folded,
)


def _roll_p1_h(x, axis_name):
    """Global circular roll(+1) along the sharded H axis (row i-1)."""
    n = jax.lax.axis_size(axis_name)
    last = x[:, -1:, :]
    perm = [(i, (i + 1) % n) for i in range(n)]
    prev_last = jax.lax.ppermute(last, axis_name, perm)
    return jnp.concatenate([prev_last, x[:, :-1, :]], axis=1)


def _roll_m1_h(x, axis_name):
    """Global circular roll(-1) along the sharded H axis (row i+1)."""
    n = jax.lax.axis_size(axis_name)
    first = x[:, :1, :]
    perm = [(i, (i - 1) % n) for i in range(n)]
    next_first = jax.lax.ppermute(first, axis_name, perm)
    return jnp.concatenate([x[:, 1:, :], next_first], axis=1)


def _grad2d_tiled(x, axis_name):
    dx = x - jnp.roll(x, 1, axis=-1)  # W unsharded: local roll
    dy = x - _roll_p1_h(x, axis_name)
    return dx, dy


def _grad2d_adjoint_tiled(zx, zy, axis_name):
    return (zx - jnp.roll(zx, -1, axis=-1)) + (zy - _roll_m1_h(zy, axis_name))


def _dist_rfft2(q, axis_name, wp):
    """H-tiled (N, Ht, W) real -> column-sharded (N, H, Wp/T) complex."""
    qf = jnp.fft.rfft(q, axis=-1)
    wf = qf.shape[-1]
    qf = jnp.pad(qf, ((0, 0), (0, 0), (0, wp - wf)))
    # Re-shard: split the padded frequency columns over devices, gather H.
    cols = jax.lax.all_to_all(qf, axis_name, split_axis=2, concat_axis=1, tiled=True)
    return jnp.fft.fft(cols, axis=-2)


def _dist_irfft2(xhat_cols, axis_name, w, wf):
    """Inverse of :func:`_dist_rfft2`: back to H-tiled real (N, Ht, W)."""
    cols = jnp.fft.ifft(xhat_cols, axis=-2)
    qf = jax.lax.all_to_all(cols, axis_name, split_axis=1, concat_axis=2, tiled=True)
    qf = qf[:, :, :wf]
    return jnp.fft.irfft(qf, n=w, axis=-1)


def _dist_rfft2_fold(q, axis_name, wp, prec):
    """Folded MXU variant of :func:`_dist_rfft2` (the multi-chip analogue of
    the single-chip ``fft_mode="fold"`` path, `ops/fft_mxu.py`).

    Local W-direction rFFT as 2 matmuls, two *real* ``all_to_all``s (same
    bytes as the complex one), then the half-H Hermitian DFT of the two real
    intermediates as 4 half-height matmuls.  Returns the column-sharded
    folded spectrum ``(a_re, a_im, b_re, b_im)``, each ``(N, Hf, Wp/T)``.
    """
    h = q.shape[1] * jax.lax.axis_size(axis_name)
    w = q.shape[-1]
    cw, sw = (jnp.asarray(m) for m in _w_fwd(w))
    chf, shf = (jnp.asarray(m) for m in _w_fwd(h))
    re1 = jnp.einsum("nhw,wk->nhk", q, cw, precision=prec)
    im1 = jnp.einsum("nhw,wk->nhk", q, sw, precision=prec)
    wf = re1.shape[-1]
    pad = ((0, 0), (0, 0), (0, wp - wf))
    re1 = jax.lax.all_to_all(
        jnp.pad(re1, pad), axis_name, split_axis=2, concat_axis=1, tiled=True
    )
    im1 = jax.lax.all_to_all(
        jnp.pad(im1, pad), axis_name, split_axis=2, concat_axis=1, tiled=True
    )
    a_re = jnp.einsum("nhk,hm->nmk", re1, chf, precision=prec)
    a_im = jnp.einsum("nhk,hm->nmk", re1, shf, precision=prec)
    b_re = jnp.einsum("nhk,hm->nmk", im1, chf, precision=prec)
    b_im = jnp.einsum("nhk,hm->nmk", im1, shf, precision=prec)
    return a_re, a_im, b_re, b_im


def _dist_irfft2_fold(pr_re, pr_im, pi_re, pi_im, axis_name, h, w, wf, prec):
    """Inverse of :func:`_dist_rfft2_fold` from the two half-stored Hermitian
    H-arguments (see ``spectral_scale_folded``) back to H-tiled real."""
    ah, bh = (jnp.asarray(m) for m in _w_inv(h))
    aw, bw = (jnp.asarray(m) for m in _w_inv(w))
    ar = jnp.einsum("nmk,mh->nhk", pr_re, ah, precision=prec) + jnp.einsum(
        "nmk,mh->nhk", pr_im, bh, precision=prec
    )
    ai = jnp.einsum("nmk,mh->nhk", pi_re, ah, precision=prec) + jnp.einsum(
        "nmk,mh->nhk", pi_im, bh, precision=prec
    )
    ar = jax.lax.all_to_all(ar, axis_name, split_axis=1, concat_axis=2, tiled=True)
    ai = jax.lax.all_to_all(ai, axis_name, split_axis=1, concat_axis=2, tiled=True)
    # Drop the padded (possibly non-finite) frequency columns BEFORE the
    # column-contracting W-inverse matmul.
    ar, ai = ar[:, :, :wf], ai[:, :, :wf]
    return jnp.einsum("nhk,kw->nhw", ar, aw, precision=prec) + jnp.einsum(
        "nhk,kw->nhw", ai, bw, precision=prec
    )


def _col_slice(arr, axis_name, wp):
    """Slice this device's frequency-column group out of a full-width array
    (zero-padding the tail columns)."""
    t = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    wf = arr.shape[-1]
    arr = jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(0, wp - wf)])
    per = wp // t
    return jax.lax.dynamic_slice_in_dim(arr, idx * per, per, axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "iters",
        "prox",
        "x_bounds",
        "mesh",
        "axis_name",
        "adapt_rho",
        "fft_mode",
    ),
)
def _tiled_solve(
    y,
    psf,
    lam,
    rho,
    iters,
    prox,
    x_bounds,
    mesh,
    axis_name,
    adapt_rho,
    mu=10.0,
    tau_scale=2.0,
    fft_mode="xla",
):
    n, h, w, = y.shape
    t = mesh.shape[axis_name]
    wf = w // 2 + 1
    wp = -(-wf // t) * t  # padded frequency-column count, divisible by T

    lap_full = laplacian_spectrum((h, w), dtype=y.dtype)  # (H, Wf)
    has_psf = psf is not None
    otf_full = (
        psf_to_otf(psf, (h, w)) if has_psf else jnp.ones((h, wf), jnp.complex64)
    )

    prox_fn = prox_lib.resolve(prox)
    in_spec = P(None, axis_name, None)
    rep = P()  # replicated
    folded = fft_mode in ("fold", "fold_precise")
    prec = (
        jax.lax.Precision.HIGH if fft_mode == "fold" else jax.lax.Precision.HIGHEST
    )

    def tile_fn(y_tile, lap_full, otf_full, lam, rho):
        # Per-device cached spectra, column-sharded: (H, Wp/T).
        lap_cols = _col_slice(lap_full, axis_name, wp)
        if not has_psf:
            denom_h = jnp.ones((), y.dtype)
            b_cols = _dist_rfft2(y_tile, axis_name, wp)
        else:
            otf_cols = _col_slice(otf_full, axis_name, wp)
            denom_h = jnp.abs(otf_cols) ** 2
            b_cols = jnp.conj(otf_cols) * _dist_rfft2(y_tile, axis_name, wp)
        if folded:
            b_fold = fold_hermitian(b_cols)

        ht = y_tile.shape[1]
        # pcast: the scan carry must be typed as tile-varying from the start.
        zeros = jax.lax.pcast(jnp.zeros((n, ht, w), y.dtype), axis_name, to="varying")

        def body(carry, _):
            x, zx, zy, ux, uy, rho_c = carry
            c_cols = 1.0 / (denom_h + rho_c * lap_cols)
            q = _grad2d_adjoint_tiled(zx - ux, zy - uy, axis_name)
            if folded:
                qa_re, qa_im, qb_re, qb_im = _dist_rfft2_fold(q, axis_name, wp, prec)
                rhs = (
                    b_fold[0] + rho_c * qa_re,
                    b_fold[1] + rho_c * qa_im,
                    b_fold[2] + rho_c * qb_re,
                    b_fold[3] + rho_c * qb_im,
                )
                ce, co = fold_even_odd(c_cols)
                x = _dist_irfft2_fold(
                    *spectral_scale_folded(rhs, ce, co), axis_name, h, w, wf, prec
                )
            else:
                qhat = _dist_rfft2(q, axis_name, wp)
                xhat = c_cols * (b_cols + rho_c * qhat)
                x = _dist_irfft2(xhat, axis_name, w, wf)
            if x_bounds is not None:
                x = jnp.clip(x, x_bounds[0], x_bounds[1])
            dxx, dxy = _grad2d_tiled(x, axis_name)
            tau = lam / rho_c
            zx_n, zy_n, ux_n, uy_n = prox_lib.prox_dual_step(
                dxx, dxy, ux, uy, tau, prox_fn
            )
            if adapt_rho:
                # Residual norms psum'd over tiles -> every tile sees the
                # same global norms and takes the same rho decision.
                r2 = jax.lax.psum(
                    jnp.sum((dxx - zx_n) ** 2 + (dxy - zy_n) ** 2), axis_name
                )
                dz = _grad2d_adjoint_tiled(zx_n - zx, zy_n - zy, axis_name)
                s2 = rho_c**2 * jax.lax.psum(jnp.sum(dz * dz), axis_name)
                r_norm, s_norm = jnp.sqrt(r2), jnp.sqrt(s2)
                grow = r_norm > mu * s_norm
                shrink = s_norm > mu * r_norm
                factor = jnp.where(grow, tau_scale, jnp.where(shrink, 1.0 / tau_scale, 1.0))
                rho_c = rho_c * factor
                ux_n = ux_n / factor
                uy_n = uy_n / factor
            return (x, zx_n, zy_n, ux_n, uy_n, rho_c), None

        rho0 = jax.lax.pcast(jnp.asarray(rho, y.dtype), axis_name, to="varying")
        init = (zeros, zeros, zeros, zeros, zeros, rho0)
        (x, *_rest), _ = jax.lax.scan(body, init, None, length=iters)
        return x

    return jax.shard_map(
        tile_fn,
        mesh=mesh,
        in_specs=(in_spec, rep, rep, rep, rep),
        out_specs=in_spec,
    )(y, lap_full, otf_full, lam, rho)


def tiled_tv_deconvolve(
    y: jnp.ndarray,
    psf: jnp.ndarray | None = None,
    lam: float = 0.1,
    rho: float = 1.0,
    iters: int = 100,
    prox: str | Callable = "aniso",
    x_bounds: tuple[float, float] | None = None,
    adapt_rho: bool = False,
    mesh: Mesh | None = None,
    axis_name: str = "tile",
    fft_mode: str = "xla",
) -> jnp.ndarray:
    """ADMM TV deconvolution with the image H axis sharded over ``mesh``.

    Args:
      y: NHWC batch ``(B, H, W, C)`` (or ``(H, W)`` / ``(H, W, C)``).
        ``H`` must divide by the tile-axis size; ``W`` must be even.
      mesh: device mesh containing ``axis_name``; required.
      adapt_rho: residual-balanced global rho (shared across tiles via psum).
      fft_mode: "xla" (native FFTs) or "fold"/"fold_precise" — the MXU
        matmul DFT in the folded half-H representation, the fast path on
        real TPU meshes (same collective bytes, DFT FLOPs on the MXU).

    Returns the restored image(s), same shape as input, H-sharded.
    """
    if fft_mode not in ("xla", "fold", "fold_precise"):
        raise ValueError(f"tiled solver fft_mode must be xla/fold/fold_precise, got {fft_mode!r}")
    if mesh is None:
        raise ValueError("tiled_tv_deconvolve requires a mesh")
    y = jnp.asarray(y)
    orig_shape = y.shape
    if y.ndim == 2:
        y4 = y[None, :, :, None]
    elif y.ndim == 3:
        y4 = y[None]
    else:
        y4 = y
    b, h, w, c = y4.shape
    t = mesh.shape[axis_name]
    if h % t != 0:
        raise ValueError(f"H={h} must divide by tile axis size {t}")
    if w % 2 != 0:
        raise ValueError(f"W={w} must be even")
    y_f = jnp.transpose(y4, (0, 3, 1, 2)).reshape(b * c, h, w)
    psf_arr = None if psf is None else jnp.asarray(psf, y_f.dtype)
    x = _tiled_solve(
        y_f,
        psf_arr,
        jnp.asarray(lam, y_f.dtype),
        jnp.asarray(rho, y_f.dtype),
        iters,
        prox,
        x_bounds,
        mesh,
        axis_name,
        adapt_rho,
        fft_mode=fft_mode,
    )
    x = jnp.transpose(x.reshape(b, c, h, w), (0, 2, 3, 1))
    return x.reshape(orig_shape)
