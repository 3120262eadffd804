"""Metric logging backends: CSV is built into the Trainer; this adds the
TensorBoard scalars + parameter-histogram logging of the reference's trainer
v2 (``train_v2.jl:60-64``: ``LogMetrics``/``LogHistograms``), gated on
tensorboardX availability."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

try:
    from tensorboardX import SummaryWriter

    HAS_TENSORBOARD = True
except ImportError:  # pragma: no cover
    SummaryWriter = None
    HAS_TENSORBOARD = False


class TensorBoardLogger:
    """Epoch-level scalar + histogram writer (no-op if tensorboardX missing)."""

    def __init__(self, log_dir: str):
        self.writer = SummaryWriter(log_dir) if HAS_TENSORBOARD else None

    def log_scalars(self, metrics: dict[str, float], step: int, prefix: str = "") -> None:
        if self.writer is None:
            return
        for name, value in metrics.items():
            self.writer.add_scalar(f"{prefix}{name}", float(value), step)

    def log_histograms(self, params: Any, step: int) -> None:
        if self.writer is None:
            return
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            self.writer.add_histogram(name, np.asarray(leaf).ravel(), step)

    def flush(self) -> None:
        if self.writer is not None:
            self.writer.flush()

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
