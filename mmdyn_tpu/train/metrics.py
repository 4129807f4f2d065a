"""Metric / image logging: JSONL always, TensorBoard when available.

Replaces the reference's SummaryWriter usage (problems.py:195-208, 588-614)
with a backend-gated writer. Also provides a numpy ``make_grid`` equivalent to
torchvision.utils.make_grid for image panels.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def _scalarize(v):
    """TensorBoard hparams accept only bool/int/float/str; stringify the rest."""
    return v if isinstance(v, (bool, int, float, str)) else str(v)


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """Tile (N, H, W, C) float images in [0,1] into one (H', W', C) panel."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = nrow
    nrows = -(-n // ncol)
    grid = np.full((nrows * (h + padding) + padding,
                    ncol * (w + padding) + padding, c), pad_value,
                   dtype=images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[i]
    return grid


class MetricWriter:
    """Writes scalars to metrics.jsonl (always) and TensorBoard (if torch's
    SummaryWriter imports)."""

    def __init__(self, log_dir, tensorboard=True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(str(self.log_dir))
            except Exception:
                self._tb = None

    def scalar(self, tag, value, step):
        rec = {"tag": tag, "value": float(value), "step": int(step),
               "time": time.time()}
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def image(self, tag, image_hwc, step):
        """Log one (H, W, C) float image in [0, 1]."""
        if self._tb is not None:
            img = np.asarray(image_hwc)
            self._tb.add_image(tag, img.transpose(2, 0, 1), int(step))

    def image_grid(self, tag, images_nhwc, step, nrow=8):
        self.image(tag, make_grid(np.asarray(images_nhwc), nrow=nrow), step)

    def text(self, tag, message, step=0):
        """Log a text record (warnings, run notes) to JSONL + TensorBoard."""
        rec = {"tag": tag, "text": str(message), "step": int(step),
               "time": time.time()}
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_text(tag, str(message), int(step))

    def figure(self, tag, fig, step):
        """Log a matplotlib figure (reference add_figure, problems.py:607)."""
        if self._tb is not None:
            self._tb.add_figure(tag, fig, int(step))
        else:
            import matplotlib.pyplot as plt
            plt.close(fig)

    def histogram(self, tag, values, step):
        if self._tb is not None:
            self._tb.add_histogram(tag, np.asarray(values), int(step))

    def hparams(self, params: dict, metrics: dict):
        """End-of-run hyperparameters + final metrics (problems.py:208).

        TensorBoard's add_hparams only accepts scalar value types; everything
        else is stringified. The full record also lands in the JSONL."""
        rec = {"tag": "hparams", "params": {k: _scalarize(v) for k, v in
                                            params.items()},
               "metrics": {k: float(v) for k, v in metrics.items()},
               "time": time.time()}
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            try:
                self._tb.add_hparams(rec["params"], rec["metrics"],
                                     run_name=".")
            except Exception:
                pass

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
