"""Benchmark harness: ADMM iterations/s per chip (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline workload: batched 1080p RGB deconvolution (4 frames, 7x7 motion
PSF, anisotropic TV) — BASELINE config 3's shape class — measured
steady-state with fresh inputs per repeat on whatever accelerator JAX
provides (the real TPU chip under the driver; CPU locally).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so round 1
establishes the baseline: the constant below is the round-1 TPU v5e
measurement; later rounds report their speedup against it.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from admm_deconv_tpu.ops.solver import tv_deconvolve

# Round-1 self-established baseline on one TPU v5e chip (iters/s, this exact
# workload, XLA-FFT solver path).  The reference repo publishes no benchmark
# numbers to compare to (BASELINE.md).
BASELINE_ITERS_PER_S = 45.9

BATCH, H, W, C = 4, 1080, 1920, 3
ITERS = 50
REPEATS = 4


def make_inputs():
    rng = np.random.default_rng(0)
    img = rng.random((BATCH, H, W, C), dtype=np.float64).astype(np.float32)
    psf = np.zeros((7, 7), np.float32)
    psf[3, :] = 1.0 / 7.0
    return jnp.asarray(img), jnp.asarray(psf)


def main():
    y, psf = make_inputs()

    # The fast path stacks three TPU-first designs: the folded half-H MXU
    # DFT ("fold1": Hermitian-symmetric DFT by matmul, ~26% fewer MXU FLOPs
    # than plain "mxu") runs its loop matmuls at bf16x1 — made parity-grade
    # by the delta-form x-update (x = x_B + irfft(rho*C . rfft(q)), x_B
    # hoisted and exact; see ops/solver.py) — and the fused Pallas stencil
    # (D -> prox -> dual -> D^T in one VMEM pass) covers the non-DFT part.
    on_tpu = jax.default_backend() != "cpu"
    fft_mode = "fold1" if on_tpu else "xla"
    prox_impl = "pallas" if on_tpu else "xla"

    def solve(y):
        return tv_deconvolve(
            y,
            psf=psf,
            lam=0.0041,
            rho=0.021,
            iters=ITERS,
            fft_mode=fft_mode,
            prox_impl=prox_impl,
        )

    # Warmup / compile.  NOTE: on the axon TPU backend block_until_ready
    # returns before device completion (async dispatch queue), so all timing
    # below forces completion with a host scalar fetch instead.
    float(jnp.sum(solve(y)))

    # Fresh input each repeat so results cannot be cached or CSE'd.
    inputs = [y + 0.001 * i for i in range(REPEATS)]
    for inp in inputs:
        float(inp[0, 0, 0, 0])
    t0 = time.perf_counter()
    for inp in inputs:
        float(jnp.sum(solve(inp)))
    elapsed = time.perf_counter() - t0

    iters_per_s = ITERS * REPEATS / elapsed
    print(
        json.dumps(
            {
                "metric": "admm_tv_deconv_iters_per_s_1080p_batch4",
                "value": round(iters_per_s, 2),
                "unit": "iters/s/chip",
                "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
