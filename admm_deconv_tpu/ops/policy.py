"""Auto-mode policy: every hardware-measured threshold behind "auto".

The solver's ``"auto"`` resolution (``fft_mode``/``prox_impl``/
``solve_auto``'s configuration) encodes wall-clock measurements taken on
ONE specific setup: a TPU v5e reached through a remote tunnel whose per-op
dispatch overhead (~0.5-1 ms) and serial remote compiles shape several of
the tradeoffs (see CLAUDE.md / BASELINE.md).  On directly-attached
hardware — or a different TPU generation — the right constants may shift,
so every one of them lives here with (a) its measured provenance and (b)
an override surface:

* environment: ``ADMM_TPU_<FIELD>=value`` (read at import and on
  :func:`refresh`), e.g. ``ADMM_TPU_DEEP_EPS_ABS=1e-5`` or
  ``ADMM_TPU_FFT_MODE_TPU=fold``.
* runtime: :func:`set_policy` (``set_policy(deep_eps_abs=1e-5)``), or the
  :func:`overrides` context manager for scoped tuning/tests.

Re-tuning recipe for new hardware: run ``python scripts/bench_suite.py``
(the ttq_* tables) and ``scripts/perf_decompose.py`` on the target, then
override whichever constants the new tables contradict — no source edits
needed.  The reference has no analogue (no auto modes, no measured
policies); this is TPU-framework surface.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os


@dataclasses.dataclass
class AutoPolicy:
    """Measured constants behind every ``"auto"`` decision.

    Each field's comment records WHERE the number came from; all are
    re-measurable via ``scripts/bench_suite.py`` on the target hardware.
    """

    # Fastest fixed-iteration fft_mode on TPU.  Provenance: BASELINE.md
    # round 2 (fold1 208.4 vs fold 127.4 iters/s at 1080p batch-4, parity
    # max dev 1.35e-3 with final-solve-at-HIGH).
    fft_mode_tpu: str = "fold1"

    # fft_mode for loops that cannot carry the delta form safely (Anderson,
    # tiled adaptive, short check blocks).  Provenance: round-3
    # BENCH_SUITE ttq tables — AA on fold1 floors (r~0.33 after 200 iters
    # where fold converges in 35).
    fft_mode_tpu_adaptive: str = "fold"

    # Minimum check_every at which the adaptive solver's "auto" picks fold1
    # (the per-block exact x_B re-hoist must amortize over the block).
    # Provenance: round 4 — at check_every=8 fold1 beats fold 0.289 vs
    # 0.311 s to tolerance at 1080p; below 4 the re-hoist runs too often.
    adaptive_fold1_min_check_every: int = 4

    # eps_abs below which adaptive/auto solvers force the bf16x3 "fold" DFT
    # and fp32 state: bf16 iterate noise floors above deeper stopping
    # thresholds.  Provenance: BENCH_SUITE_r4 ttq_deep_512 (eps 1e-5/1e-4:
    # fold1-adaptive capped at 400 iterations where fold stopped at 128;
    # same measurement round 5 for bf16 state).
    deep_eps_abs: float = 1e-4

    # prox_impl on accelerators ("pallas" = the fused one-pass stencil
    # kernels).  Provenance: round-1 perf_decompose — the jnp composition's
    # stencil section costs ~2x the fused kernel at 1080p (87.9 -> 103.9
    # iters/s); on CPU interpreted Pallas is far slower than XLA fusion.
    prox_impl_accel: str = "pallas"

    # Whether solve_auto stores the loop carry in bf16 on TPU (at standard
    # tolerances).  Provenance: round 4 — +20% throughput at 1080p,
    # parity-grade (-0.01 dB on the blocks scenario).
    bf16_state_on_tpu: bool = True

    # Run the per-solve precompute FFTs (rfft2(y), the OTF, the fold1
    # x_B hoist and its per-block adaptive re-derivations) on the MXU at
    # HIGHEST precision instead of XLA's native TPU FFT.  Provenance:
    # round-5 roofline — the loop alone runs 284/203 iters/s at 1080p/4K
    # while the full solve measured 260/178; the gap is dominated by the
    # native-FFT precompute (XLA TPU FFT ~6% of HBM bandwidth, CLAUDE.md).
    # HIGHEST-precision MXU DFT matches the fp32 FFT to ~1e-6 relative.
    precompute_fft_mxu: bool = True

    # solve_auto's residual-check block length.  Provenance: round-3/4 ttq
    # tables — check_every=8 beats per-iteration checking at every measured
    # scale (norm reductions amortize; adaptation stays responsive).
    solve_auto_check_every: int = 8


_FIELDS = {f.name: f for f in dataclasses.fields(AutoPolicy)}


def _from_env() -> AutoPolicy:
    kw = {}
    for name, f in _FIELDS.items():
        raw = os.environ.get(f"ADMM_TPU_{name.upper()}")
        if raw is None:
            continue
        if f.type in ("int", int):
            kw[name] = int(raw)
        elif f.type in ("float", float):
            kw[name] = float(raw)
        elif f.type in ("bool", bool):
            kw[name] = raw.strip().lower() in ("1", "true", "yes", "on")
        else:
            kw[name] = raw
    return AutoPolicy(**kw)


_policy = _from_env()


def policy() -> AutoPolicy:
    """The active auto-mode policy (env overrides applied)."""
    return _policy


def refresh() -> AutoPolicy:
    """Re-read ``ADMM_TPU_*`` environment overrides (drops set_policy)."""
    global _policy
    _policy = _from_env()
    return _policy


def set_policy(**kwargs) -> AutoPolicy:
    """Override policy fields at runtime (e.g. after re-tuning on new
    hardware).  Unknown fields raise."""
    global _policy
    unknown = set(kwargs) - set(_FIELDS)
    if unknown:
        raise ValueError(f"unknown policy fields: {sorted(unknown)}")
    _policy = dataclasses.replace(_policy, **kwargs)
    return _policy


@contextlib.contextmanager
def overrides(**kwargs):
    """Scoped policy override (tests, A/B tuning)."""
    global _policy
    prev = _policy
    try:
        set_policy(**kwargs)
        yield _policy
    finally:
        _policy = prev
