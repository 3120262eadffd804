"""Pallas TPU kernels, validated in interpreter mode against the jnp
reference compositions, plus the solver's q-carry fast path (SURVEY.md §2.9:
the reference's CUDA broadcast-kernel surface maps to these fused kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from admm_deconv_tpu.ops import prox as prox_lib
from admm_deconv_tpu.ops.diff import grad2d, grad2d_adjoint
from admm_deconv_tpu.ops.pallas.prox_kernels import fused_prox_dual
from admm_deconv_tpu.ops.pallas.stencil_kernels import (
    _pick_block_rows,
    fused_admm_stencil,
)
from admm_deconv_tpu.ops.solver import tv_deconvolve

MODES = ["aniso", "iso", "hard", "gauss"]


def _mk(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("mode", MODES)
def test_fused_prox_dual_matches_jnp(rng, mode):
    shape = (2, 40, 256)
    dxx, dxy, ux, uy = (_mk(rng, shape) for _ in range(4))
    tau = 0.3
    got = fused_prox_dual(dxx, dxy, ux, uy, tau, mode=mode, interpret=True)
    want = prox_lib.prox_dual_step(
        dxx, dxy, ux, uy, tau, prox_lib.resolve(mode)
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("shape", [(2, 64, 256), (3, 24, 128), (1, 40, 384)])
def test_fused_admm_stencil_matches_jnp(rng, mode, shape):
    x, ux, uy = (_mk(rng, shape) for _ in range(3))
    tau = 0.3
    q, ux2, uy2 = fused_admm_stencil(x, ux, uy, tau, mode=mode, interpret=True)
    dxx, dxy = grad2d(x)
    zx, zy, ux_r, uy_r = prox_lib.prox_dual_step(
        dxx, dxy, ux, uy, tau, prox_lib.resolve(mode)
    )
    q_r = grad2d_adjoint(zx - ux_r, zy - uy_r)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ux2), np.asarray(ux_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(uy2), np.asarray(uy_r), atol=1e-5)


def test_pick_block_rows():
    assert _pick_block_rows(1080, 1920) is not None
    assert 1080 % _pick_block_rows(1080, 1920) == 0
    assert _pick_block_rows(1080, 1920) % 8 == 0
    assert _pick_block_rows(7, 128) is None  # no multiple-of-8 divisor


class TestFastPathEquivalence:
    """The q-carry fast loop must reproduce the reference-shaped loop
    exactly (the diagnostics path still runs the 5-plane-state scan)."""

    @pytest.fixture
    def problem(self, rng):
        y = jnp.asarray(rng.random((2, 64, 48, 3)), jnp.float32)
        psf = np.zeros((5, 5), np.float32)
        psf[2, :] = 1 / 5
        return y, jnp.asarray(psf)

    @pytest.mark.parametrize(
        "kwargs",
        [
            {},
            {"prox": "iso"},
            {"alpha": 1.6},
            {"x_bounds": (0.0, 1.0)},
            {"lam": np.asarray([0.01, 0.02], np.float32)},
        ],
        ids=["default", "iso", "overrelax", "bounds", "per_image_lam"],
    )
    def test_matches_diagnostics_path(self, problem, kwargs):
        y, psf = problem
        lam = kwargs.pop("lam", 0.01)
        x_fast = tv_deconvolve(y, psf=psf, lam=lam, rho=0.1, iters=13, **kwargs)
        x_slow, _ = tv_deconvolve(
            y, psf=psf, lam=lam, rho=0.1, iters=13,
            return_diagnostics=True, **kwargs,
        )
        np.testing.assert_allclose(
            np.asarray(x_fast), np.asarray(x_slow), atol=2e-6
        )

    def test_warm_start(self, problem):
        y, psf = problem
        _, state = tv_deconvolve(
            y, psf=psf, lam=0.01, rho=0.1, iters=7, return_state=True
        )
        x_fast = tv_deconvolve(
            y, psf=psf, lam=0.01, rho=0.1, iters=6, init_state=state
        )
        x_slow, _ = tv_deconvolve(
            y, psf=psf, lam=0.01, rho=0.1, iters=6,
            init_state=state, return_diagnostics=True,
        )
        np.testing.assert_allclose(
            np.asarray(x_fast), np.asarray(x_slow), atol=2e-6
        )

    def test_single_iteration(self, problem):
        y, psf = problem
        a = tv_deconvolve(y, psf=psf, lam=0.01, rho=0.1, iters=1)
        b, _ = tv_deconvolve(
            y, psf=psf, lam=0.01, rho=0.1, iters=1, return_diagnostics=True
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    def test_differentiable_with_remat(self, problem):
        y, psf = problem
        g = jax.grad(
            lambda yy: jnp.sum(
                tv_deconvolve(yy, psf=psf, lam=0.01, rho=0.1, iters=5, remat=True)
            )
        )(y)
        assert bool(jnp.all(jnp.isfinite(g)))
