"""Jitted train / eval / sample steps.

One fused XLA program per step: batch parse (stride/roll transforms), the
model forward(s), loss, backward, and the optimizer update all compile into a
single launch with donated buffers. kl_weight is a traced scalar so the KL
annealing schedule (problems.py:212-216) causes no recompilation.

Under a sharded batch (parallel/mesh.py) the same jitted function runs SPMD:
XLA inserts the gradient all-reduce over the 'data' mesh axis automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from mmdyn_tpu.problems.base import ProblemConfig
from mmdyn_tpu.problems.specs import evaluate, parse_batch
from mmdyn_tpu.problems.transforms import augment_batch


def _loss_fn(params, model, cfg, batch, rng, kl_weight, train=False):
    if train and cfg.augment:
        # train-time only; rng split leaves the no-augment path bit-identical
        rng, aug_key = jax.random.split(rng)
        batch = augment_batch(batch, aug_key, max_shift=cfg.augment_shift,
                              brightness=cfg.augment_brightness)
    inputs, targets = parse_batch(cfg, batch)

    def run(params, inputs, targets, rng, kl_weight):
        return evaluate(cfg, model, {"params": params}, rng, inputs, targets,
                        kl_weight)

    if cfg.remat:
        # trade FLOPs for HBM: recompute activations in the backward pass
        # (useful at very large per-chip batches)
        run = jax.checkpoint(run, static_argnums=())
    loss, aux = run(params, inputs, targets, rng, kl_weight)
    return loss, aux


def make_train_step(cfg: ProblemConfig, model, tx: optax.GradientTransformation):
    """Returns jitted (state, batch, rng, kl_weight) -> (state, metrics)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng, kl_weight):
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (loss, aux), grads = grad_fn(state.params, model, cfg, batch, rng,
                                     kl_weight, True)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        metrics = {"loss": loss, **aux.get("perf_measure", {})}
        return new_state, metrics

    return train_step


def make_eval_step(cfg: ProblemConfig, model):
    """Returns jitted (params, batch, rng, kl_weight) -> (metrics, aux).

    Mirrors _test_epoch (problems.py:173-191): the model stays in 'train mode'
    (batch-stat BatchNorm, active dropout) but no gradients flow.
    """

    @jax.jit
    def eval_step(params, batch, rng, kl_weight):
        loss, aux = _loss_fn(params, model, cfg, batch, rng, kl_weight)
        metrics = {"loss": loss, **aux.get("perf_measure", {})}
        return metrics, aux

    return eval_step


def make_sample_fn(cfg: ProblemConfig, model, n: int = 50):
    """Prior sampling for latent-space logging (problems.py:548-559).

    Draws z ~ N(0, I) (n samples) and decodes; sigmoid applied for
    visualisation only (problems.py:616-626).
    """
    if cfg.problem_type == "regression":
        return None

    @jax.jit
    def sample(params, rng, condition=None):
        kz, kc = jax.random.split(rng)
        z = jax.random.normal(kz, (n, cfg.latent_size))
        variables = {"params": params}
        if cfg.is_mvae and cfg.cross_modal:
            vis, tac = model.apply(variables, z, condition,
                                   method=type(model).inference)
            return {"visual": jax.nn.sigmoid(vis), "tactile": jax.nn.sigmoid(tac)}
        out = model.apply(variables, z, condition,
                          method=type(model).inference)
        return {cfg.input_type: jax.nn.sigmoid(out)}

    return sample
