"""Shared prox forward/VJP math for the fused Pallas kernels.

Pure-jnp expressions usable both *inside* Pallas kernel bodies (jnp lowers to
VPU ops there) and as the host-side analytic backward when no valid kernel
block exists.  The four modes mirror the reference's threshold operators
(``src/ops/ops.jl:8-11``): aniso = ST, iso = BT, hard = HT, gauss = GT, with
the per-pixel (not batch-coupled) isotropic norm convention documented in
:mod:`admm_deconv_tpu.ops.prox`.

The VJPs are the exact almost-everywhere gradients of the jnp compositions in
``ops/prox.py`` — verified against ``jax.grad`` of those compositions in
``tests/test_pallas.py``.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12

MODES = ("aniso", "iso", "hard", "gauss")


def prox_apply(mode: str, vx, vy, tau):
    """z = prox(v, tau) over the gradient pair; tau broadcastable to v."""
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
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown prox mode {mode!r}")
    return zx, zy


def prox_vjp(mode: str, vx, vy, tau, zbx, zby):
    """VJP of ``z = prox(v, tau)``: given cotangents ``(zbx, zby)`` return
    ``(vbx, vby, taub_map)`` where ``taub_map`` is the *elementwise* tau
    cotangent (caller reduces it over the pixel axes)."""
    if mode == "aniso":
        mx = (jnp.abs(vx) > tau).astype(vx.dtype)
        my = (jnp.abs(vy) > tau).astype(vy.dtype)
        vbx = mx * zbx
        vby = my * zby
        taub = -(jnp.sign(vx) * vbx + jnp.sign(vy) * vby)
    elif mode == "iso":
        r = jnp.sqrt(vx * vx + vy * vy)
        rs = jnp.maximum(r, _EPS)
        active = (r > tau).astype(vx.dtype)
        dot = vx * zbx + vy * zby
        scale = 1.0 - tau / rs
        vbx = active * (scale * zbx + tau * dot * vx / (rs * rs * rs))
        vby = active * (scale * zby + tau * dot * vy / (rs * rs * rs))
        taub = -active * dot / rs
    elif mode == "hard":
        vbx = (jnp.abs(vx) > tau).astype(vx.dtype) * zbx
        vby = (jnp.abs(vy) > tau).astype(vy.dtype) * zby
        taub = jnp.zeros_like(vx)
    elif mode == "gauss":
        r2 = vx * vx + vy * vy
        e = jnp.exp(-r2 / (2.0 * tau * tau))
        scale = 0.5 - 0.5 * e
        ds_dr2 = e / (4.0 * tau * tau)
        dot = vx * zbx + vy * zby
        vbx = scale * zbx + 2.0 * ds_dr2 * dot * vx
        vby = scale * zby + 2.0 * ds_dr2 * dot * vy
        taub = -(0.5 * e * r2 / (tau * tau * tau)) * dot
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown prox mode {mode!r}")
    return vbx, vby, taub
