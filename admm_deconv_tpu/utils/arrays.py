"""Array helpers (reference ``src/utilities/base_funcs.jl`` equivalents)."""

from __future__ import annotations

import jax.numpy as jnp


def expand_dims(arr: jnp.ndarray, dim_idx: int) -> jnp.ndarray:
    """Insert a singleton dimension at ``dim_idx`` (0-indexed; reference
    ``expand_dims``, ``base_funcs.jl:11-15`` is 1-indexed Julia)."""
    return jnp.expand_dims(arr, dim_idx)


def fftn_matlike(arr: jnp.ndarray, out_shape: tuple[int, ...]) -> jnp.ndarray:
    """N-D FFT of ``arr`` zero-padded (trailing) to ``out_shape`` — MATLAB
    ``fftn(X, sz)`` semantics (reference ``fftnMatLike``,
    ``base_funcs.jl:53-64``)."""
    if arr.ndim != len(out_shape):
        raise ValueError(
            "out_shape must have one entry per dimension of the input "
            f"(got {len(out_shape)} for ndim {arr.ndim})"
        )
    pads = [(0, int(o) - int(s)) for s, o in zip(arr.shape, out_shape)]
    if any(p[1] < 0 for p in pads):
        raise ValueError(f"out_shape {out_shape} smaller than input {arr.shape}")
    return jnp.fft.fftn(jnp.pad(arr, pads))
