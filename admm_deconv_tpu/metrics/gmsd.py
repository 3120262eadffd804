"""Gradient Magnitude Similarity Deviation (GMSD) metric / training loss.

Parity with reference ``src/metrics/gmsd.jl`` + ``src/metrics/iqa_utils.jl``:
Sobel gradients (kernels normalized by 8, ``iqa_utils.jl:12-17``) via
circularly padded per-channel convolution (``iqa_utils.jl:44-47``), gradient
magnitude with 1e-16 epsilon (``iqa_utils.jl:53-55``), similarity map with
``t=0.0026``, ``alpha=0`` (``gmsd.jl:5-13``), score = batch mean of the
per-image standard deviation of the GMS map (``gmsd.jl:22-26``).  Used as a
training loss by the reference's trainer v1 (``src/train.jl:191``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Rows [1 2 1; 0 0 0; -1 -2 -1]/8 — the reference's SOBEL_KERNEL_X
# (iqa_utils.jl:12-16, columns cat'ed along dim 2); "_Y" is its transpose.
SOBEL_X = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=np.float64) / 8.0
SOBEL_Y = SOBEL_X.T


def _sobel_grads(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel Sobel responses with circular (wrap) padding, NHWC."""
    c = x.shape[-1]
    kx = jnp.asarray(SOBEL_X[:, :, None, None], dtype=x.dtype)
    ky = jnp.asarray(SOBEL_Y[:, :, None, None], dtype=x.dtype)
    kx = jnp.tile(kx, (1, 1, 1, c))
    ky = jnp.tile(ky, (1, 1, 1, c))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")

    def conv(inp, k):
        return jax.lax.conv_general_dilated(
            inp,
            k,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    return conv(xp, kx), conv(xp, ky)


def _gradient_magnitude(gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(gx * gx + gy * gy + 1e-16)


def gmsd(
    x: jnp.ndarray,
    y: jnp.ndarray,
    t: float = 0.0026,
    alpha: float = 0.0,
) -> jnp.ndarray:
    """GMSD score between NHWC batches (lower is better; scalar)."""
    if x.ndim == 3:
        x, y = x[None], y[None]
    gxx, gxy = _sobel_grads(x)
    gyx, gyy = _sobel_grads(y)
    map_x = _gradient_magnitude(gxx, gxy)
    map_y = _gradient_magnitude(gyx, gyy)

    num = 2.0 * map_x * map_y - alpha * map_x * map_y + t
    den = map_x * map_x + map_y * map_y - alpha * map_x * map_y + t
    gms = num / den

    mean_gms = jnp.mean(gms, axis=(1, 2, 3), keepdims=True)
    score = jnp.mean((gms - mean_gms) ** 2, axis=(1, 2, 3))
    return jnp.mean(jnp.sqrt(score))


def gmsd_loss(x: jnp.ndarray, y: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Alias of :func:`gmsd` (reference ``gmsd.jl:30``)."""
    return gmsd(x, y, **kwargs)
