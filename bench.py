"""Benchmark harness: ADMM iterations/s per chip (BASELINE.json metric).

Prints one JSON line PER metric; the HEADLINE (1080p batch-4 iters/s) is
LAST, which is the line the driver parses.  The extra lines put the 4K
solver and the flagship train step under per-round regression tracking
(VERDICT round-2 weak #7) — their ``vs_baseline`` is against the round-2
BASELINE.md measurements.

Headline workload: batched 1080p RGB deconvolution (4 frames, 7x7 motion
PSF, anisotropic TV) — BASELINE config 3's shape class — measured
steady-state with fresh inputs per repeat on whatever accelerator JAX
provides (the real TPU chip under the driver; CPU locally).

``vs_baseline`` (headline): the reference publishes no numbers (BASELINE.md),
so round 1 established it: the constant below is the round-1 TPU v5e
measurement; later rounds report their speedup against it.
"""

import json
import time

import numpy as np
from admm_deconv_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from admm_deconv_tpu.ops.solver import tv_deconvolve

# Round-1 self-established baseline on one TPU v5e chip (iters/s, this exact
# workload, XLA-FFT solver path).  The reference repo publishes no benchmark
# numbers to compare to (BASELINE.md).
BASELINE_ITERS_PER_S = 45.9
# Round-2 fast-path measurements (BASELINE.md) for the secondary metrics.
BASELINE_4K_ITERS_PER_S = 148.0
# Train-step baseline pinned at round 2's FAST-MODE measurement (81.7 ms,
# AdmmDenoiser with fold1+pallas solver modes) — not the 85.5 ms default-mode
# figure — so vs_baseline measures progress, not mode selection (VERDICT
# round-3 weak #4).
BASELINE_TRAIN_MS = 81.7

BATCH, H, W, C = 4, 1080, 1920, 3
ITERS = 50
REPEATS = 4


def make_inputs(shape=(BATCH, H, W, C)):
    rng = np.random.default_rng(0)
    img = rng.random(shape, dtype=np.float64).astype(np.float32)
    psf = np.zeros((7, 7), np.float32)
    psf[3, :] = 1.0 / 7.0
    return jnp.asarray(img), jnp.asarray(psf)


def time_fresh(fn, base, repeats=REPEATS):
    """Steady-state timing: fresh inputs per repeat, device completion
    forced by a host scalar fetch (axon's block_until_ready returns before
    completion — CLAUDE.md)."""
    float(jnp.sum(fn(base)))  # warmup/compile
    inputs = [base + 0.001 * i for i in range(repeats)]
    for inp in inputs:
        float(inp.ravel()[0])
    t0 = time.perf_counter()
    for inp in inputs:
        float(jnp.sum(fn(inp)))
    return (time.perf_counter() - t0) / repeats


def main():
    # The fast path stacks four TPU-first designs: the folded half-H MXU
    # DFT ("fold1": Hermitian-symmetric DFT by matmul, ~26% fewer MXU FLOPs
    # than plain "mxu") runs its loop matmuls at bf16x1 — made parity-grade
    # by the delta-form x-update (x = x_B + irfft(rho*C . rfft(q)), x_B
    # hoisted and exact; see ops/solver.py) — the fused Pallas stencil
    # (D -> prox -> dual -> D^T in one VMEM pass) covers the non-DFT part,
    # and (round 4) the loop carry (q, ux, uy) is STORED bf16 while all
    # arithmetic stays fp32 in VMEM: the stencil section is HBM-bound, so
    # halving its bytes bought 206 -> 247 iters/s at 1080p with -0.01 dB
    # on the blocks parity scenario (BASELINE.md round 4).
    sdt = "bfloat16" if jax.default_backend() != "cpu" else None
    def solve(y, psf):
        return tv_deconvolve(
            y, psf=psf, lam=0.0041, rho=0.021, iters=ITERS,
            fft_mode="auto", prox_impl="auto", state_dtype=sdt,
        )

    # ---- secondary metrics first (the driver parses the LAST line) -------
    # repeats=6: a 10-repeat round-4 re-measure put this workload at 148.1
    # iters/s median with ~1% spread — the round-3 driver artifact's 146.4
    # (repeats=3) was sampling noise, not a regression (BASELINE.md round 4).
    y4k, psf = make_inputs((1, 2160, 3840, 3))
    s4k = time_fresh(lambda v: solve(v, psf), y4k, repeats=6)
    print(json.dumps({
        "metric": "admm_tv_deconv_iters_per_s_4k_frame",
        "value": round(ITERS / s4k, 2),
        "unit": "iters/s/chip",
        "vs_baseline": round(ITERS / s4k / BASELINE_4K_ITERS_PER_S, 3),
    }), flush=True)

    try:
        import optax
        from admm_deconv_tpu.metrics import gmsd_loss
        from admm_deconv_tpu.models import AdmmDenoiser

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.random((2, 112, 112, 3)), jnp.float32)
        t = jnp.asarray(rng.random((2, 112, 112, 3)), jnp.float32)
        model = AdmmDenoiser()
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        opt = optax.adabelief(1e-4)
        opt_state = jax.jit(opt.init)(params)

        @jax.jit
        def step(params, opt_state, x, t):
            loss, grads = jax.value_and_grad(
                lambda p: gmsd_loss(model.apply(p, x), t)
            )(params)
            upd, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, upd), opt_state, loss

        s_step = time_fresh(
            lambda xi: step(params, opt_state, xi, t)[2], x, repeats=8
        )
        print(json.dumps({
            "metric": "flagship_train_step_ms",
            "value": round(s_step * 1e3, 1),
            "unit": "ms/step",
            "vs_baseline": round(BASELINE_TRAIN_MS / (s_step * 1e3), 3),
        }), flush=True)
    except Exception as e:  # pragma: no cover - keep the headline alive
        print(json.dumps({"metric": "flagship_train_step_ms",
                          "error": str(e)[:200]}), flush=True)

    # ---- headline (LAST): 1080p batch-4 -----------------------------------
    y, psf = make_inputs()
    s = time_fresh(lambda v: solve(v, psf), y)
    iters_per_s = ITERS / s
    print(json.dumps({
        "metric": "admm_tv_deconv_iters_per_s_1080p_batch4",
        "value": round(iters_per_s, 2),
        "unit": "iters/s/chip",
        "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
