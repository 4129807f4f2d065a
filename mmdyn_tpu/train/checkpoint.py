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
                    name: Optional[str] = None, key=None,
                    batch_in_epoch: int = 0):
    """Save a snapshot; name defaults to epoch_<N> (problems.py:585).

    ``key`` (the training PRNG key at save time) and ``batch_in_epoch`` make
    the snapshot preemption-exact: ``batch_in_epoch == 0`` means epoch
    ``epoch`` COMPLETED (resume starts at epoch+1, the historical semantics);
    ``batch_in_epoch == k > 0`` means epoch ``epoch`` was interrupted after
    its first k optimizer steps (resume replays that epoch's shuffle — the
    loader order is a pure function of (seed, epoch) — skips k batches, and
    continues with the saved key, bit-identical to the uninterrupted run).
    """
    name = name or f"epoch_{epoch}"
    path = (Path(checkpoint_dir) / name).absolute()
    payload = {
        "state": state,
        "epoch": np.asarray(epoch, np.int64),
        "best_loss": np.asarray(best_loss, np.float64),
        "key": (np.zeros(2, np.uint32) if key is None
                else np.asarray(jax.device_get(key), np.uint32)),
        "has_key": np.asarray(key is not None),
        "batch_in_epoch": np.asarray(batch_in_epoch, np.int64),
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


def restore_checkpoint(path, target_state) -> tuple[Any, int, float, Any, int]:
    """Restore (state, epoch, best_loss, key_or_None, batch_in_epoch) using
    target_state as the pytree spec. Checkpoints written before the
    preemption fields existed restore with key=None, batch_in_epoch=0."""
    ckptr = _checkpointer()
    template = {
        "state": target_state,
        "epoch": np.asarray(0, np.int64),
        "best_loss": np.asarray(0.0, np.float64),
        "key": np.zeros(2, np.uint32),
        "has_key": np.asarray(False),
        "batch_in_epoch": np.asarray(0, np.int64),
    }
    path = Path(path).absolute()
    try:
        restored = ckptr.restore(path, template)
        key = restored["key"] if bool(restored["has_key"]) else None
        batch = int(restored["batch_in_epoch"])
    except Exception:
        # legacy layout (pre round-4): no preemption fields
        restored = ckptr.restore(path, {k: template[k] for k in
                                        ("state", "epoch", "best_loss")})
        key, batch = None, 0
    return (restored["state"], int(restored["epoch"]),
            float(restored["best_loss"]), key, batch)
