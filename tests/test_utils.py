"""Utils tests: array helpers, 3-D diff adjointness, profiling, debug."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from admm_deconv_tpu.utils import (
    expand_dims,
    fftn_matlike,
    forward_diff3d,
    divergence3d,
    IterationTimer,
    enable_nan_checks,
)


class TestArrays:
    def test_expand_dims(self, rng):
        x = jnp.asarray(rng.random((3, 4)))
        assert expand_dims(x, 1).shape == (3, 1, 4)

    def test_fftn_matlike_pads(self, rng):
        x = jnp.asarray(rng.random((3, 4)), jnp.float32)
        out = fftn_matlike(x, (8, 8))
        expected = np.fft.fftn(np.pad(np.asarray(x), ((0, 5), (0, 4))))
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-4)

    def test_fftn_matlike_validates(self):
        with pytest.raises(ValueError):
            fftn_matlike(jnp.zeros((3, 4)), (8,))
        with pytest.raises(ValueError):
            fftn_matlike(jnp.zeros((3, 4)), (2, 8))


class TestDiff3d:
    def test_adjointness(self, rng):
        """<forward_diff3d(u), p> == -<u, divergence3d(p)> — the identity the
        reference's buggy divergence3d (base_funcs.jl:102) violates."""
        u = jnp.asarray(rng.standard_normal((4, 5, 6, 2)), jnp.float32)
        px = jnp.asarray(rng.standard_normal((4, 5, 6, 2)), jnp.float32)
        py = jnp.asarray(rng.standard_normal((4, 5, 6, 2)), jnp.float32)
        pz = jnp.asarray(rng.standard_normal((4, 5, 6, 2)), jnp.float32)
        beta = (1.0, 1.0, 1.0)
        dx, dy, dz = forward_diff3d(u, beta)
        lhs = float(jnp.sum(dx * px) + jnp.sum(dy * py) + jnp.sum(dz * pz))
        rhs = -float(jnp.sum(u * divergence3d(px, py, pz, beta)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_beta_validation(self):
        with pytest.raises(ValueError):
            forward_diff3d(jnp.zeros((2, 2, 2)), (1.0, 2.0))


class TestProfiling:
    def test_iteration_timer(self):
        import jax

        fn = jax.jit(lambda x: x * 2 + 1)
        timer = IterationTimer(fn, lambda i: (jnp.full((8, 8), float(i)),))
        stats = timer.measure(repeats=2)
        assert stats["seconds_per_call"] > 0
        assert stats["repeats"] == 2


class TestDebug:
    def test_nan_checks_toggle(self):
        import jax

        enable_nan_checks(True)
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.asarray(1.0))
        enable_nan_checks(False)


class TestSolverStateIO:
    def test_save_load_roundtrip(self, tmp_path, rng):
        import jax.numpy as jnp
        from admm_deconv_tpu.ops.solver import tv_deconvolve
        from admm_deconv_tpu.utils import save_solver_state, load_solver_state

        y = jnp.asarray(rng.random((16, 16)), jnp.float32)
        x10, state = tv_deconvolve(
            y, None, lam=0.05, rho=0.5, iters=10, return_state=True
        )
        p = str(tmp_path / "state.npz")
        save_solver_state(p, state)
        restored = load_solver_state(p)
        x_resumed = tv_deconvolve(
            y, None, lam=0.05, rho=0.5, iters=10, init_state=restored
        )
        x20 = tv_deconvolve(y, None, lam=0.05, rho=0.5, iters=20)
        np.testing.assert_allclose(
            np.asarray(x_resumed), np.asarray(x20), rtol=1e-5, atol=1e-6
        )


class TestCompileCache:
    """Round 5: persistent-compile-cache helper (fold1 first-compile
    mitigation)."""

    def test_enable_sets_config_and_creates_dir(self, tmp_path, monkeypatch):
        import jax

        from admm_deconv_tpu.utils.compile_cache import enable_compile_cache

        monkeypatch.delenv("ADMM_TPU_NO_COMPILE_CACHE", raising=False)
        d = str(tmp_path / "xla_cache")
        prev = jax.config.jax_compilation_cache_dir
        try:
            got = enable_compile_cache(d)
            assert got == d and os.path.isdir(d)
            assert jax.config.jax_compilation_cache_dir == d
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)

    def test_opt_out_env(self, tmp_path, monkeypatch):
        from admm_deconv_tpu.utils.compile_cache import enable_compile_cache

        monkeypatch.setenv("ADMM_TPU_NO_COMPILE_CACHE", "1")
        assert enable_compile_cache(str(tmp_path / "x")) is None
        assert not os.path.isdir(str(tmp_path / "x"))
