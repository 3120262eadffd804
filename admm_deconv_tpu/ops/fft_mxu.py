"""MXU-matmul 2-D real FFT: DFTs as dense cos/sin matrix products.

Why: XLA's native TPU FFT runs the solver's hot rfft2/irfft2 pair at a few
percent of HBM bandwidth (measured ~19 ms for 12x1080x1920 fp32 on v5e),
leaving the MXU idle.  A DFT is a matrix product, and the systolic array is
exactly the machine for dense matrix products — so this module implements
``rfft2``/``irfft2`` as batched real matmuls against precomputed cos/sin
matrices, in split re/im representation (no complex dtype anywhere; complex
arithmetic is expanded into real MXU contractions).

Cost: O(H*W*(H+Wf)) FLOPs per image instead of O(H*W*log(H*W)) — a deliberate
FLOPs-for-bandwidth trade that wins on TPU for image-sized transforms
because the MXU's FLOP budget is vastly larger than what the FFT's memory
traffic can feed.  Transform matrices are built host-side in float64 at
trace time (shapes are static) and live as on-device constants.

Accuracy: matmul precision is configurable; the default ``HIGHEST``
(bf16x6 passes) matches fp32 FFT to ~1e-6 relative; ``HIGH`` (bf16x3) is
faster with ~1e-4 relative error.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Precision = jax.lax.Precision


@functools.lru_cache(maxsize=32)
def _w_fwd(w: int, dtype=np.float32):
    """Real->complex forward matrices along W: (W, Wf) cos and -sin."""
    wf = w // 2 + 1
    n = np.arange(w)[:, None].astype(np.float64)
    k = np.arange(wf)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / w
    return np.cos(ang).astype(dtype), (-np.sin(ang)).astype(dtype)


@functools.lru_cache(maxsize=32)
def _w_inv(w: int, dtype=np.float32):
    """Complex->real inverse matrices along W: (Wf, W) weighted cos / -sin.

    Hermitian reconstruction: x[n] = (1/W)(X[0] + 2 sum_mid Re[X e^{+i..}]
    + (-1)^n X[W/2]); the per-bin weight (1, 2, ..., 2, 1) and 1/W scale are
    folded into the matrices.
    """
    wf = w // 2 + 1
    k = np.arange(wf)[:, None].astype(np.float64)
    n = np.arange(w)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * n / w
    wt = np.full((wf, 1), 2.0)
    wt[0] = 1.0
    if w % 2 == 0:
        wt[-1] = 1.0
    a = (wt * np.cos(ang)) / w
    b = (-wt * np.sin(ang)) / w
    return a.astype(dtype), b.astype(dtype)


@functools.lru_cache(maxsize=32)
def _h_mats(h: int, dtype=np.float32):
    """Symmetric (H, H) cos/sin DFT matrices for the H axis."""
    n = np.arange(h)[:, None].astype(np.float64)
    k = np.arange(h)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * n * k / h
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


# Note on a rejected design (kept as a record for future tuning): fusing the
# re/im planes into matmuls with a concatenated ~2*Wf minor axis cuts the op
# count from ~18 to ~10, but the TPU compiler pathologically slow-compiles
# GEMMs with such wide outputs at deep contractions (948 s vs 4 s for the
# same FLOPs at Wf columns) and the runtime regressed ~10% from relayouts.
# The separate-matmul formulation below compiles and runs fastest.


def rfft2_mxu(
    x: jnp.ndarray, precision=Precision.HIGHEST
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2-D real-to-complex DFT over the last two axes via MXU matmuls.

    Returns the spectrum as a ``(re, im)`` pair of shape ``(..., H, W//2+1)``
    matching ``jnp.fft.rfft2``.
    """
    h, w = x.shape[-2], x.shape[-1]
    cw, sw = (jnp.asarray(m) for m in _w_fwd(w))
    ch, sh = (jnp.asarray(m) for m in _h_mats(h))
    # W direction (real input): 2 matmuls.
    re1 = jnp.einsum("...hw,wk->...hk", x, cw, precision=precision)
    im1 = jnp.einsum("...hw,wk->...hk", x, sw, precision=precision)
    # H direction (complex): e^{-i a}(r + i m) -> 4 matmuls.
    re2 = (
        jnp.einsum("...hk,hm->...mk", re1, ch, precision=precision)
        + jnp.einsum("...hk,hm->...mk", im1, sh, precision=precision)
    )
    im2 = (
        jnp.einsum("...hk,hm->...mk", im1, ch, precision=precision)
        - jnp.einsum("...hk,hm->...mk", re1, sh, precision=precision)
    )
    return re2, im2


def irfft2_mxu(
    re: jnp.ndarray,
    im: jnp.ndarray,
    s: tuple[int, int],
    precision=Precision.HIGHEST,
) -> jnp.ndarray:
    """Inverse of :func:`rfft2_mxu` back to a real array of spatial shape
    ``s`` (matches ``jnp.fft.irfft2`` for hermitian-consistent input)."""
    h, w = s
    ch, sh = (jnp.asarray(m) for m in _h_mats(h))
    aw, bw = (jnp.asarray(m) for m in _w_inv(w))
    inv_h = 1.0 / h
    # Inverse H (complex): e^{+i a}(r + i m), scaled by 1/H.
    ar = (
        jnp.einsum("...mk,mh->...hk", re, ch, precision=precision)
        - jnp.einsum("...mk,mh->...hk", im, sh, precision=precision)
    ) * inv_h
    ai = (
        jnp.einsum("...mk,mh->...hk", im, ch, precision=precision)
        + jnp.einsum("...mk,mh->...hk", re, sh, precision=precision)
    ) * inv_h
    # Inverse W (hermitian -> real): 2 matmuls, weights/scale folded in.
    return jnp.einsum("...hk,kw->...hw", ar, aw, precision=precision) + jnp.einsum(
        "...hk,kw->...hw", ai, bw, precision=precision
    )
