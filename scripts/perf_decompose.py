"""Per-iteration cost decomposition of the ADMM hot loop on the bench shape.

Times, each as a 50-iteration `lax.scan` on the bench workload's folded shape
(12 planes of 1080x1920 fp32):

  full      — the real solver body (mxu FFT mode, aniso prox, alpha=1)
  spectral  — only rfft2_mxu -> epilogue -> irfft2_mxu (the MXU DFT part)
  stencil   — only the spatial/elementwise part (D^T, D, prox, dual ascent)
  rfft/irfft — the two DFT halves in isolation

Run on the TPU: `python scripts/perf_decompose.py`.  Used to decide where
optimization effort goes (matmul FLOPs vs per-op overhead).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from admm_deconv_tpu.ops.diff import grad2d, grad2d_adjoint
from admm_deconv_tpu.ops.fft import laplacian_spectrum, psf_to_otf
from admm_deconv_tpu.ops.fft_mxu import (
    fold_even_odd,
    fold_hermitian,
    irfft2_mxu,
    irfft2_mxu_folded,
    rfft2_mxu,
    rfft2_mxu_folded,
    spectral_scale_folded,
)
from admm_deconv_tpu.ops import prox as prox_lib
from admm_deconv_tpu.utils.profiling import IterationTimer

N, H, W = 12, 1080, 1920
ITERS = 50
PREC = jax.lax.Precision.HIGH
WF = W // 2 + 1


def make_consts():
    rng = np.random.default_rng(0)
    psf = np.zeros((7, 7), np.float32)
    psf[3, :] = 1 / 7
    otf = psf_to_otf(jnp.asarray(psf), (H, W))
    lap = laplacian_spectrum((H, W))
    rho = jnp.float32(0.021)
    c_spec = 1.0 / (jnp.abs(otf) ** 2 + rho * lap)
    y = jnp.asarray(rng.random((N, H, W)), jnp.float32)
    b_c = jnp.conj(otf) * jnp.fft.rfft2(y)
    return c_spec, (jnp.real(b_c), jnp.imag(b_c)), rho


C_SPEC, (BR, BI), RHO = jax.jit(make_consts)()
TAU = jnp.float32(0.0041 / 0.021)
PROX = prox_lib.resolve("aniso")


def scan50(body):
    @jax.jit
    def run(*state):
        out, _ = jax.lax.scan(lambda s, _: (body(*s), None), state, None, length=ITERS)
        return out

    return run


def full_body(zx, zy, ux, uy):
    q = grad2d_adjoint(zx - ux, zy - uy)
    qr, qi = rfft2_mxu(q, precision=PREC)
    x = irfft2_mxu(C_SPEC * (BR + RHO * qr), C_SPEC * (BI + RHO * qi), (H, W), precision=PREC)
    dxx, dxy = grad2d(x)
    return prox_lib.prox_dual_step(dxx, dxy, ux, uy, TAU, PROX)


def spectral_body(x):
    qr, qi = rfft2_mxu(x, precision=PREC)
    x = irfft2_mxu(C_SPEC * (BR + RHO * qr), C_SPEC * (BI + RHO * qi), (H, W), precision=PREC)
    return (x,)


def make_folded_consts():
    ce, co = fold_even_odd(C_SPEC)
    ba = fold_hermitian(BR + 1j * BI)
    return ce, co, ba


_FOLDED = jax.jit(make_folded_consts)()


def spectral_folded_body(x):
    ce, co, (ba_re, ba_im, bb_re, bb_im) = _FOLDED
    qa_re, qa_im, qb_re, qb_im = rfft2_mxu_folded(x, precision=PREC)
    rhs = (
        ba_re + RHO * qa_re,
        ba_im + RHO * qa_im,
        bb_re + RHO * qb_re,
        bb_im + RHO * qb_im,
    )
    x = irfft2_mxu_folded(
        *spectral_scale_folded(rhs, ce, co), (H, W), precision=PREC
    )
    return (x,)


def make_delta_consts():
    x_b = jnp.fft.irfft2(C_SPEC * (BR + 1j * BI), s=(H, W))
    ce, co = fold_even_odd(RHO * C_SPEC)
    return x_b, ce, co


_DELTA = jax.jit(make_delta_consts)()


def spectral_fold1_body(x):
    """Delta-form bf16x1 fold path (fft_mode='fold1')."""
    x_b, ce, co = _DELTA
    prec = jax.lax.Precision.DEFAULT
    f = rfft2_mxu_folded(x, precision=prec)
    x = x_b + irfft2_mxu_folded(
        *spectral_scale_folded(f, ce, co), (H, W), precision=prec
    )
    return (x,)


def stencil_body(zx, zy, ux, uy):
    q = grad2d_adjoint(zx - ux, zy - uy)
    dxx, dxy = grad2d(q)
    return prox_lib.prox_dual_step(dxx, dxy, ux, uy, TAU, PROX)


def rfft_body(x):
    qr, qi = rfft2_mxu(x, precision=PREC)
    # keep a real-valued carry of the input's shape
    return (qr[..., :1] * 0 + x * 0.999,) if False else (x * 0.999 + qr[..., :1].sum() * 0,)


def rfft_body2(x):
    qr, qi = rfft2_mxu(x, precision=PREC)
    return (x + 1e-7 * (qr[..., :1] + qi[..., :1]),)


def irfft_body(re, im):
    x = irfft2_mxu(re, im, (H, W), precision=PREC)
    return (re + 1e-7 * x[..., :WF], im)


def time_loop(name, body, state_maker):
    fn = scan50(body)
    timer = IterationTimer(lambda *s: fn(*s), state_maker)
    stats = timer.measure(repeats=3, warmup=1)
    ms = stats["seconds_per_call"] / ITERS * 1e3
    print(f"{name:10s}  {ms:7.3f} ms/iter   ({stats['seconds_per_call']:.3f} s / {ITERS} iters)")
    return ms


def main():
    print(f"backend={jax.default_backend()}  shape=({N},{H},{W}) fp32, {ITERS}-iter scans")
    rng = np.random.default_rng(1)

    def plane(i):
        return jnp.asarray(rng.random((N, H, W)) + i * 1e-3, jnp.float32)

    def four(i):
        return plane(i), plane(i + 10), plane(i + 20), plane(i + 30)

    def spec_pair(i):
        return (
            jnp.asarray(rng.random((N, H, WF)) + i * 1e-3, jnp.float32),
            jnp.asarray(rng.random((N, H, WF)), jnp.float32),
        )

    t_full = time_loop("full", full_body, four)
    t_spec = time_loop("spectral", spectral_body, lambda i: (plane(i),))
    time_loop("spec_fold", spectral_folded_body, lambda i: (plane(i),))
    time_loop("spec_fold1", spectral_fold1_body, lambda i: (plane(i),))
    t_sten = time_loop("stencil", stencil_body, four)
    t_rfft = time_loop("rfft", rfft_body2, lambda i: (plane(i),))
    t_irfft = time_loop("irfft", irfft_body, spec_pair)
    print(f"\nspectral+stencil = {t_spec + t_sten:.3f} vs full {t_full:.3f}")


if __name__ == "__main__":
    main()
