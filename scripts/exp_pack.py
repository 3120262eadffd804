"""Experiment: factored packed C2C ("pack") vs fold1 on the headline shapes.

The pack mode was benched as a loss in round 1-2, BEFORE the q-carry loop,
the fused stencil, and the bf16 carry moved the bottleneck into the DFT
matmuls themselves.  The round-5 roofline says 4K is MXU-FLOP-bound
(spectral floor 3.04 of 3.80 ms/iter); the four-step factorization cuts
those FLOPs ~7x at the cost of ~28 extra loop-body ops (~23 us each).
Re-measure with the current loop.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from admm_deconv_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from admm_deconv_tpu.ops.solver import tv_deconvolve

ITERS = 50


def make_inputs(shape):
    rng = np.random.default_rng(0)
    img = rng.random(shape, dtype=np.float64).astype(np.float32)
    psf = np.zeros((7, 7), np.float32)
    psf[3, :] = 1.0 / 7.0
    return jnp.asarray(img), jnp.asarray(psf)


def time_fresh(fn, base, repeats=4):
    float(jnp.sum(fn(base)))
    inputs = [base + 0.001 * i for i in range(repeats)]
    for inp in inputs:
        float(inp.ravel()[0])
    t0 = time.perf_counter()
    for inp in inputs:
        float(jnp.sum(fn(inp)))
    return (time.perf_counter() - t0) / repeats


def main():
    shapes = {
        "4k": (1, 2160, 3840, 3),
        "1080p_b4": (4, 1080, 1920, 3),
    }
    configs = [
        ("fold1_bf16", dict(fft_mode="fold1", state_dtype="bfloat16")),
        ("pack", dict(fft_mode="pack", state_dtype=None)),
        ("pack_bf16", dict(fft_mode="pack", state_dtype="bfloat16")),
    ]
    which = sys.argv[1:] or list(shapes)
    for name in which:
        shape = shapes[name]
        y, psf = make_inputs(shape)
        for tag, kw in configs:
            t0 = time.perf_counter()
            try:
                s = time_fresh(
                    lambda v: tv_deconvolve(
                        y=v, psf=psf, lam=0.0041, rho=0.021, iters=ITERS,
                        prox_impl="auto", **kw,
                    ),
                    y,
                )
            except Exception as e:
                print(json.dumps({"shape": name, "mode": tag,
                                  "error": str(e)[:200]}), flush=True)
                continue
            print(json.dumps({
                "shape": name, "mode": tag,
                "iters_per_s": round(ITERS / s, 2),
                "ms_per_solve": round(s * 1e3, 1),
                "first_call_s": round(time.perf_counter() - t0 - s * 4, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
