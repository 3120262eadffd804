"""Circular 3-D forward differences and divergence (adjoint).

Capability parity with the reference's unused ``forward_diff3d`` /
``divergence3d`` (``base_funcs.jl:67-106``) — with its copy-paste bug fixed:
the reference's ``divergence3d`` reads ``y`` where ``z`` is intended at
``base_funcs.jl:102``, so its z-axis term is wrong; here the divergence is
the exact negative adjoint of the forward difference (verified by the
adjointness test).

Convention: ``diff`` along each axis with the circular residual appended,
matching the reference's ``cat(diff(data), first - last)`` construction.
"""

from __future__ import annotations

import jax.numpy as jnp


def _fwd(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Circular forward difference: out[i] = x[i+1] - x[i] (wrapping)."""
    return jnp.roll(x, -1, axis=axis) - x


def _fwd_adjoint(z: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Adjoint of :func:`_fwd`: out[i] = z[i-1] - z[i] (wrapping)."""
    return jnp.roll(z, 1, axis=axis) - z


def forward_diff3d(
    data: jnp.ndarray, beta: tuple[float, float, float] = (1.0, 1.0, 1.0)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scaled circular forward differences along the first three axes."""
    if len(beta) != 3:
        raise ValueError("beta param. must have 3 elements")
    return (
        beta[0] * _fwd(data, 0),
        beta[1] * _fwd(data, 1),
        beta[2] * _fwd(data, 2),
    )


def divergence3d(
    x: jnp.ndarray,
    y: jnp.ndarray,
    z: jnp.ndarray,
    beta: tuple[float, float, float] = (1.0, 1.0, 0.0),
) -> jnp.ndarray:
    """Negative adjoint (divergence) of :func:`forward_diff3d`:
    ``<forward_diff3d(u), (x,y,z)> == -<u, divergence3d(x,y,z)>``."""
    if len(beta) != 3:
        raise ValueError("beta param. must have 3 elements")
    return -(
        beta[0] * _fwd_adjoint(x, 0)
        + beta[1] * _fwd_adjoint(y, 1)
        + beta[2] * _fwd_adjoint(z, 2)
    )
