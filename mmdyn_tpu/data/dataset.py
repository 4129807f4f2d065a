"""Compiled-array dataset + loader setup.

Mirrors dataset_setup / VisuoTactileDataset (mmdyn/pytorch/utils/datasets.py:
20-108) on top of the packed npz format from compile.py. Frames are stored
uint8 at 64x64 and converted to float32/255 on device (the ToTensor scaling,
datasets.py:25), so the host never touches pixels after compile.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


from mmdyn_tpu.data.compile import (COMPILED_NAME, compile_dataset,
                                    compiled_name_for)
from mmdyn_tpu.data.loader import BatchLoader


class VisuoTactileArrays:
    """Train or test split view over the compiled arrays.

    Split matches datasets.py:100-108: first 80% train, ``[frac:-1]`` test
    (the reference drops the final sequence from the test split; replicated).
    """

    KEYS = ("visual", "tactile", "pose", "avail", "seg",
            "final_visual", "final_tactile", "final_pose", "shock")

    def __init__(self, dataset_path, train=True, train_frac=0.8,
                 compiled_name=None, strict_parity=True, mmap=True,
                 crop=True):
        from mmdyn_tpu.data.compile import load_packed

        root = Path(os.path.expanduser(str(dataset_path)))
        if compiled_name is None:
            compiled_name = compiled_name_for(crop)
        packed_path = root / compiled_name
        if not packed_path.exists():
            compile_dataset(root, strict_parity=strict_parity,
                            compiled_name=compiled_name, crop=crop)
        arrays = load_packed(packed_path, mmap=mmap)
        self.seq_length = int(arrays.pop("seq_length"))
        self.has_shock = bool(arrays.pop("has_shock", False))
        self.crop = bool(arrays.pop("crop", True))
        # normalisation constants (absent in pre-round-3 compiled datasets)
        self.norms = {k: np.asarray(arrays.pop(k)).tolist()
                      for k in ("pose_min", "pose_max",
                                "shock_min", "shock_max") if k in arrays}

        n = arrays["visual"].shape[0]
        frac_index = int(train_frac * n)
        sl = slice(0, frac_index) if train else slice(frac_index, n - 1)
        self.arrays = {k: v[sl] for k, v in arrays.items()}
        self.train = train

    def __len__(self):
        return self.arrays["visual"].shape[0]

    @property
    def shock_dim(self):
        """condition_dim probe (problems.py:675-681: len of the shock entry,
        falling back to the last per-frame field)."""
        if "shock" in self.arrays:
            return int(self.arrays["shock"].shape[-1])
        return int(self.arrays["avail"].shape[-1])


def dataset_setup(dataset_path, problem_type, batchsize=128, shuffle=True,
                  seed=0, strict_parity=True, mask_loss=True, crop=True,
                  **_unused):
    """Build train/test splits + loaders (datasets.py:20-66).

    Both loaders drop the last incomplete batch; only the train loader
    shuffles (per-epoch), matching the reference DataLoader flags.
    """
    print(f"Loading dataset from {dataset_path}"
          + ("" if crop else " (no-crop variant)"))
    train_dataset = VisuoTactileArrays(dataset_path, train=True,
                                       strict_parity=strict_parity, crop=crop)
    test_dataset = VisuoTactileArrays(dataset_path, train=False,
                                      strict_parity=strict_parity, crop=crop)
    # seq_modeling / regression consume only frame 0 of each sequence
    # (problems.py:648 stride) — don't ship the other T-1 frames to HBM
    frames = 1 if problem_type in ("seq_modeling", "regression") else None
    # the seg masks only feed the --mask-loss reconstruction term
    # (problems.py:438-448); skip the host->HBM transfer entirely otherwise
    skip = () if mask_loss else ("seg",)
    # multi-process JAX (jax.distributed.initialize before Problem setup):
    # every host sees the same seeded global batch order and materialises
    # only its own row block; to_device_batch assembles the global arrays
    import jax

    pidx, pcnt = jax.process_index(), jax.process_count()
    proc = dict(process_index=pidx, process_count=pcnt) if pcnt > 1 else {}
    train_loader = BatchLoader(train_dataset.arrays, batchsize,
                               shuffle=shuffle, drop_last=True, seed=seed,
                               frames=frames, skip=skip, **proc)
    test_loader = BatchLoader(test_dataset.arrays, batchsize,
                              shuffle=False, drop_last=True, seed=seed,
                              frames=frames, skip=skip, **proc)
    return {
        "train_dataset": train_dataset,
        "test_dataset": test_dataset,
        "train_loader": train_loader,
        "test_loader": test_loader,
        "seq_length": train_dataset.seq_length,
    }
