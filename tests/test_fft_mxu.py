"""MXU-matmul DFT tests: parity with jnp.fft and solver-mode agreement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from admm_deconv_tpu.ops.fft_mxu import rfft2_mxu, irfft2_mxu
from admm_deconv_tpu.ops.solver import tv_deconvolve


class TestRfft2Mxu:
    @pytest.mark.parametrize("shape", [(8, 16), (3, 12, 20), (2, 15, 17)])
    def test_forward_matches_jnp(self, rng, shape):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        re, im = rfft2_mxu(x)
        ref = jnp.fft.rfft2(x)
        np.testing.assert_allclose(np.asarray(re), np.asarray(ref.real), atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(im), np.asarray(ref.imag), atol=1e-3, rtol=1e-4)

    @pytest.mark.parametrize("shape", [(8, 16), (4, 10, 14), (2, 9, 13)])
    def test_roundtrip(self, rng, shape):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        re, im = rfft2_mxu(x)
        back = irfft2_mxu(re, im, x.shape[-2:])
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)

    def test_inverse_matches_jnp_irfft2(self, rng):
        # Arbitrary hermitian-consistent spectrum: rfft2 of a real image.
        x = jnp.asarray(rng.standard_normal((5, 12, 16)), jnp.float32)
        spec = jnp.fft.rfft2(x)
        got = irfft2_mxu(jnp.real(spec), jnp.imag(spec), (12, 16))
        ref = jnp.fft.irfft2(spec, s=(12, 16))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


class TestSolverFftModes:
    def test_mxu_matches_xla(self, rng):
        img = np.clip(rng.random((2, 32, 32, 3)), 0, 1).astype(np.float32)
        psf = np.zeros((5, 5), np.float32)
        psf[2, :] = 0.2
        y = jnp.asarray(img)
        x_xla = tv_deconvolve(y, psf=psf, lam=0.01, rho=0.05, iters=15, fft_mode="xla")
        x_mxu = tv_deconvolve(
            y, psf=psf, lam=0.01, rho=0.05, iters=15, fft_mode="mxu_precise"
        )
        np.testing.assert_allclose(
            np.asarray(x_mxu), np.asarray(x_xla), atol=1e-4, rtol=1e-3
        )

    def test_mxu_fast_mode_close(self, rng):
        img = np.clip(rng.random((32, 32)), 0, 1).astype(np.float32)
        y = jnp.asarray(img)
        x_xla = tv_deconvolve(y, None, lam=0.05, rho=0.5, iters=10, fft_mode="xla")
        x_mxu = tv_deconvolve(y, None, lam=0.05, rho=0.5, iters=10, fft_mode="mxu")
        np.testing.assert_allclose(
            np.asarray(x_mxu), np.asarray(x_xla), atol=2e-3
        )

    def test_bad_mode_rejected(self):
        with pytest.raises(ValueError, match="fft_mode"):
            tv_deconvolve(jnp.zeros((8, 8)), None, fft_mode="nope")

    def test_mxu_differentiable(self, rng):
        y = jnp.asarray(rng.random((16, 16)), jnp.float32)

        def loss(lam):
            return jnp.mean(
                tv_deconvolve(y, None, lam=lam, rho=0.5, iters=5, fft_mode="mxu_precise") ** 2
            )

        g = jax.grad(loss)(0.05)
        assert np.isfinite(float(g))
