"""Peak signal-to-noise ratio.

Parity with reference ``src/metrics/psnr.jl:5-11``: per-image MSE over the
spatial+channel axes, then the batch mean of ``20*log10(peak/sqrt(mse))``.
(The reference's ``mse == 0`` early-return is a dead branch — an array/scalar
comparison — so zero-MSE is instead guarded with a tiny epsilon here.)
"""

from __future__ import annotations

import jax.numpy as jnp


def peak_snr(x: jnp.ndarray, y: jnp.ndarray, peak_val: float = 1.0) -> jnp.ndarray:
    """Mean PSNR over the batch; inputs NHWC (or any layout with batch first)."""
    axes = tuple(range(1, x.ndim)) if x.ndim > 1 else ()
    mse = jnp.mean((y - x) ** 2, axis=axes)
    mse = jnp.maximum(mse, jnp.finfo(x.dtype).tiny)
    return jnp.mean(20.0 * jnp.log10(peak_val / jnp.sqrt(mse)))
