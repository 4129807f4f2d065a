"""Checkpointing with resume (capability the reference lacks: it saves
best-validation snapshots, problems.py:580-586, but has no path to restore
optimizer state or continue training).

Uses orbax-checkpoint. Layout under <checkpoint_dir>:
    epoch_<N>/   — best-validation snapshots (reference-compatible naming)
    latest/      — rolling snapshot for resume
Each checkpoint stores {state (params+opt_state+step), epoch, best_loss}.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def save_checkpoint(checkpoint_dir, state, epoch: int, best_loss: float,
                    name: Optional[str] = None):
    """Save a snapshot; name defaults to epoch_<N> (problems.py:585)."""
    name = name or f"epoch_{epoch}"
    path = (Path(checkpoint_dir) / name).absolute()
    payload = {
        "state": state,
        "epoch": np.asarray(epoch, np.int64),
        "best_loss": np.asarray(best_loss, np.float64),
    }
    ckptr = _checkpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(checkpoint_dir) -> Optional[Path]:
    """Most recent checkpoint path: 'latest' if present, else highest epoch_N."""
    d = Path(checkpoint_dir)
    if not d.exists():
        return None
    if (d / "latest").exists():
        return d / "latest"
    epochs = []
    for p in d.iterdir():
        if p.is_dir() and p.name.startswith("epoch_"):
            try:
                epochs.append((int(p.name.split("_")[1]), p))
            except ValueError:
                pass
    return max(epochs)[1] if epochs else None


def restore_checkpoint(path, target_state) -> tuple[Any, int, float]:
    """Restore (state, epoch, best_loss) using target_state as the pytree spec."""
    ckptr = _checkpointer()
    template = {
        "state": target_state,
        "epoch": np.asarray(0, np.int64),
        "best_loss": np.asarray(0.0, np.float64),
    }
    restored = ckptr.restore(Path(path).absolute(), template)
    return restored["state"], int(restored["epoch"]), float(restored["best_loss"])
