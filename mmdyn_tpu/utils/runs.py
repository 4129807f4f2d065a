"""Reattach saved runs: problem.pkl -> ProblemConfig.

The reference pickles its argparse namespace next to each run
(mmdyn/pytorch/main.py:69) and can only re-load it for manual analysis
(problems.py:68-83). Here the same record drives both offline evaluation
(cli/evaluate.py) and the deployment path (mmdyn_tpu.serve).
"""

from __future__ import annotations

import pickle
from pathlib import Path


def load_run_args(run_dir) -> dict:
    """Read <run>/problem.pkl into a plain dict (vars(args) or a namespace)."""
    with open(Path(run_dir) / "problem.pkl", "rb") as f:
        saved = pickle.load(f)
    return saved if isinstance(saved, dict) else vars(saved)


def config_from_args(saved: dict, batchsize=None, num_epochs=0,
                     compute_dtype=None):
    """Rebuild the ProblemConfig a run was trained with.

    Mirrors the flag -> config mapping in cli/main.py; unknown/new flags fall
    back to the reference defaults so old run dirs stay loadable.
    """
    from mmdyn_tpu.problems.base import ProblemConfig

    if compute_dtype is None:
        saved_dtype = saved.get("dtype")
        if saved_dtype and saved_dtype != "auto":
            compute_dtype = saved_dtype
        else:
            # "auto" resolves against the dataset at train time; offline
            # reattachment defaults to f32 (norms.json records the resolved
            # train-time policy for anyone who needs it)
            compute_dtype = ("bfloat16_full" if saved.get("bf16_full")
                             else "bfloat16" if saved.get("bf16")
                             else "float32")
    return ProblemConfig(
        problem_type=saved["problem_type"],
        model_name=saved["model_name"],
        input_type=saved["input_type"],
        use_pose=saved.get("use_pose", False),
        conditional=saved.get("conditional", False),
        mask_loss=saved.get("mask_loss", False),
        kl_weight=saved.get("kl_weight", 1.0),
        pose_multiplier=saved.get("pose_multiplier", 1000.0),
        latent_size=saved.get("latent_size", 256),
        annealing_epochs=saved.get("annealing_epochs", 50),
        lr=saved.get("lr", 1e-3),
        optimizer=saved.get("optimizer", "Adam"),
        batchsize=batchsize or saved.get("batchsize", 128),
        num_epochs=num_epochs,
        compute_dtype=compute_dtype,
    )
