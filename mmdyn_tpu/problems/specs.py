"""Batch parsing per problem type + evaluation dispatch.

Batches arrive from the data layer as a dict of (B, T, ...) arrays:

    visual, tactile:       (B, T, H, W, 3) float32 in [0, 1]
    pose:                  (B, T, 7)
    avail:                 (B, T, 2)    — available_modals (carried but unused
                                          by the reference loss; kept for parity)
    shock:                 (B, T, S)    — optional
    final_visual/tactile:  (B, H, W, 3) — resting frames
    final_pose:            (B, 7)
    seg:                   (B, T, H, W, 3) — loss masks

Each parser mirrors the corresponding reference ``parse_input``:
  * seq_modeling  (problems.py:634-673) — stride [::T] == frame 0 per sequence
  * dyn_modeling  (problems.py:765-803) — roll(-1) with resting-frame patch;
    pose targets are rolled WITHOUT the patch, replicating the reference
    behaviour exactly (problems.py:798)
  * regression    (problems.py:291-316)
  * reconstruction (problems.py:96-108, 460-471) — autoencode all frames
"""

from __future__ import annotations

from mmdyn_tpu.problems.base import ProblemConfig
from mmdyn_tpu.problems.reconstruction import (
    mvae_evaluate,
    regression_evaluate,
    vae_evaluate,
)
from mmdyn_tpu.problems.transforms import (
    dyn_roll,
    dyn_targets,
    flatten_seq,
    stride_first,
)


def _first(batch, key):
    v = batch.get(key)
    return None if v is None else stride_first(v)


def _single_modality_key(cfg: ProblemConfig) -> str:
    """The array key for a single-modality input type; rejects types the
    visuotactile problems don't support (the reference leaves model_input
    None and fails loudly, problems.py:639-655)."""
    if cfg.input_type not in ("visual", "tactile"):
        raise ValueError(
            f"input_type '{cfg.input_type}' is not supported by "
            f"{cfg.problem_type} (valid: visual, tactile, visuotactile)")
    return cfg.input_type


def parse_seq_modeling(cfg: ProblemConfig, batch):
    inputs = {
        "avail": _first(batch, "avail"),
        "shock": _first(batch, "shock"),
    }
    targets = {"loss_mask": _first(batch, "seg")}
    if cfg.input_type == "visuotactile":
        inputs["visual"] = stride_first(batch["visual"])
        inputs["tactile"] = stride_first(batch["tactile"])
        targets["visual"] = batch["final_visual"]
        targets["tactile"] = batch["final_tactile"]
        if cfg.use_pose:
            inputs["pose"] = stride_first(batch["pose"])
            targets["pose"] = batch["final_pose"]
    else:
        key = _single_modality_key(cfg)
        inputs["x"] = stride_first(batch[key])
        targets["x"] = batch[f"final_{key}"]
    return inputs, targets


def parse_dyn_modeling(cfg: ProblemConfig, batch):
    inputs = {
        "avail": flatten_seq(batch["avail"]) if batch.get("avail") is not None else None,
        "shock": flatten_seq(batch["shock"]) if batch.get("shock") is not None else None,
    }
    targets = {"loss_mask": flatten_seq(batch["seg"]) if batch.get("seg") is not None else None}
    if cfg.input_type == "visuotactile":
        inputs["visual"] = flatten_seq(batch["visual"])
        inputs["tactile"] = flatten_seq(batch["tactile"])
        targets["visual"] = dyn_targets(batch["visual"], batch["final_visual"])
        targets["tactile"] = dyn_targets(batch["tactile"], batch["final_tactile"])
        if cfg.use_pose:
            inputs["pose"] = flatten_seq(batch["pose"])
            # reference rolls pose targets WITHOUT the resting patch
            targets["pose"] = dyn_roll(batch["pose"])
    else:
        key = _single_modality_key(cfg)
        inputs["x"] = flatten_seq(batch[key])
        targets["x"] = dyn_targets(batch[key], batch[f"final_{key}"])
    return inputs, targets


def parse_regression(cfg: ProblemConfig, batch):
    key = _single_modality_key(cfg)
    inputs = {
        "x": stride_first(batch[key]),
        "shock": _first(batch, "shock"),
    }
    targets = {"pose": batch["final_pose"]}
    return inputs, targets


def parse_reconstruction(cfg: ProblemConfig, batch):
    """Plain autoencoding of every frame (targets == inputs)."""
    inputs = {"shock": flatten_seq(batch["shock"]) if batch.get("shock") is not None else None}
    targets = {}
    if cfg.input_type == "visuotactile":
        inputs["visual"] = flatten_seq(batch["visual"])
        inputs["tactile"] = flatten_seq(batch["tactile"])
        targets["visual"] = inputs["visual"]
        targets["tactile"] = inputs["tactile"]
        if cfg.use_pose:
            inputs["pose"] = flatten_seq(batch["pose"])
            targets["pose"] = inputs["pose"]
    else:
        key = _single_modality_key(cfg)
        inputs["x"] = flatten_seq(batch[key])
        targets["x"] = inputs["x"]
    return inputs, targets


PROBLEM_PARSERS = {
    "seq_modeling": parse_seq_modeling,
    "dyn_modeling": parse_dyn_modeling,
    "regression": parse_regression,
    "reconstruction": parse_reconstruction,
}


def parse_batch(cfg: ProblemConfig, batch):
    return PROBLEM_PARSERS[cfg.problem_type](cfg, batch)


def evaluate(cfg: ProblemConfig, model, variables, rng, inputs, targets,
             kl_weight):
    """Dispatch to the model-appropriate loss (problems.py set_criterion)."""
    if cfg.problem_type == "regression":
        return regression_evaluate(model, variables, rng, inputs, targets,
                                   kl_weight, cfg)
    if cfg.is_mvae and cfg.cross_modal:
        return mvae_evaluate(model, variables, rng, inputs, targets,
                             kl_weight, cfg)
    return vae_evaluate(model, variables, rng, inputs, targets, kl_weight, cfg)
