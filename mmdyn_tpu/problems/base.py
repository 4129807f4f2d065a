"""Problem configuration, KL annealing, optimizer factory."""

from __future__ import annotations

import dataclasses
from typing import Optional

import optax

from mmdyn_tpu import config as cfg_mod


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """Static (compile-time) problem configuration.

    Field defaults mirror the reference CLI defaults (mmdyn/pytorch/main.py).
    Frozen + hashable so it can be closed over by jitted functions.
    """

    problem_type: str = "seq_modeling"
    model_name: str = "cnn-mvae"
    input_type: str = "visual"
    use_pose: bool = False
    conditional: bool = False
    mask_loss: bool = False
    kl_weight: float = 1.0
    pose_multiplier: float = 1000.0
    latent_size: int = 256
    annealing_epochs: int = 50
    lr: float = 1e-3
    optimizer: str = "Adam"
    batchsize: int = 128
    num_epochs: int = 100
    condition_dim: Optional[int] = None
    categorical_conditions: bool = False
    compute_dtype: str = "float32"   # "bfloat16" feeds the MXU at full rate
    remat: bool = False              # rematerialise activations in backward
    augment: bool = False            # on-device train-time augmentation
    augment_shift: int = 4           # max |pixels| of random translation
    augment_brightness: float = 0.1  # max relative brightness jitter
    noise_free: bool = False         # z = posterior mean (diagnostic knob
                                     # for controlled parity experiments —
                                     # tools/elbo_parity.py --noise-free)

    def __post_init__(self):
        assert self.problem_type in cfg_mod.PROBLEM_TYPES, "Invalid problem type."
        assert self.input_type in cfg_mod.INPUT_TYPES, "Input type is not implemented"
        assert self.optimizer in cfg_mod.OPTIMIZERS, "loss name not implemented in Problem"
        if self.augment:
            # geometric augmentation is image-space; pose targets/inputs, the
            # regression pose objective, and directional conditions (the exp_3
            # shock force is a lateral vector — a mirrored scene with an
            # un-mirrored force would corrupt the conditional dynamics) would
            # all silently decohere
            # ValueError (not assert): running under `python -O` must not
            # silently drop a guard against corrupted supervision
            if (self.use_pose or self.conditional
                    or self.problem_type == "regression"):
                raise ValueError(
                    "--augment supports image-only problems (visual/tactile/"
                    "visuotactile without --use-pose/--conditional)")

    @property
    def cross_modal(self) -> bool:
        # problems.py:45
        return self.input_type == "visuotactile"

    @property
    def is_mvae(self) -> bool:
        return "mvae" in self.model_name


def select_compute_dtype(cfg: ProblemConfig, seq_length: int) -> str:
    """Resolve the ``"auto"`` activation policy by model batch size.

    Measured crossover (docs/PARITY.md benchmark matrix): the end-to-end
    bfloat16 policy (``bfloat16_full``) wins once the step is bandwidth-
    saturated (~512 rows through the conv stack: 19.9 vs 22.8 ms at batch
    512) but LOSES below it (9.9 vs 8.2 ms at batch 128 — the extra converts
    cost more than the byte savings). Rows differ per problem: seq_modeling
    and regression stride to one frame per sequence (problems.py:648-655),
    dyn_modeling and reconstruction run every frame of the flattened batch.
    """
    if cfg.compute_dtype != "auto":
        return cfg.compute_dtype
    import jax
    if jax.default_backend() != "tpu":
        # the bf16 policies were measured on TPU HBM; on CPU/GPU-less hosts
        # (tests, parity runs) emulated bfloat16 only loses
        return "float32"
    rows = cfg.batchsize
    if cfg.problem_type in ("dyn_modeling", "reconstruction"):
        rows = cfg.batchsize * max(1, seq_length)
    return "bfloat16_full" if rows >= 512 else "bfloat16"


def anneal_kl(epoch: int, annealing_epochs: int) -> float:
    """kl_weight schedule (problems.py:212-216): linear warmup then 1."""
    if epoch < annealing_epochs:
        return (epoch + 1) / annealing_epochs
    return 1.0


def make_optimizer(cfg: ProblemConfig) -> optax.GradientTransformation:
    """Optimizer factory matching problems.py:130-138.

    SGD: lr, momentum=0.9, weight_decay=5e-4 (decay added to the gradient
    before momentum, torch semantics). Adam: lr, torch-default betas/eps.
    """
    if cfg.optimizer == "SGD":
        return optax.chain(
            optax.add_decayed_weights(5e-4),
            optax.sgd(cfg.lr, momentum=0.9),
        )
    return optax.adam(cfg.lr)
