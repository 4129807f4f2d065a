"""VAE / MVAE evaluation: loss + metrics as pure jittable functions.

The reference evaluates the MVAE by running the full model once per modality
subset — 3 passes without pose, 7 with (mmdyn/pytorch/problems/problems.py:
473-529). That is the right semantics but the wrong TPU program: encoders
recompute identical activations per pass and each pass launches small kernels.

Here the subset evaluation is restructured (same loss, in expectation):

1. each modality encoder runs ONCE (BatchNorm batch statistics and dropout
   noise are therefore shared across subsets — each subset's marginal
   distribution is unchanged, so the ELBO estimator stays unbiased);
2. all subset posteriors come from ``masked_poe`` vmapped over a static 0/1
   subset matrix (prior expert always on);
3. reparameterisation draws independent noise per subset (as the reference's
   per-pass ``reparametrize`` does);
4. decoders are vmapped over the subset axis — one big MXU-friendly launch per
   decoder instead of K small ones, while BatchNorm statistics remain
   *per-subset* because vmap maps (it does not flatten subsets into the batch);
5. only decodes whose outputs appear in the loss are computed (the reference
   decodes every modality every pass and discards unused outputs,
   vae.py:160-163).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmdyn_tpu.ops.kernels import fused_poe_reparam
from mmdyn_tpu.ops.losses import bce_with_logits, kl_divergence, mse
from mmdyn_tpu.ops.poe import masked_poe, reparametrize

# Expert order: [prior, visual, tactile] (+ [pose]).
# Subset rows mirror the reference pass order (problems.py:478-529).
SUBSETS_NO_POSE = (
    (1.0, 1.0, 1.0),  # joint (v, t)
    (1.0, 1.0, 0.0),  # visual only
    (1.0, 0.0, 1.0),  # tactile only
)
VIS_LOSS_NO_POSE = (0, 1)
TAC_LOSS_NO_POSE = (0, 2)

SUBSETS_POSE = (
    (1.0, 1.0, 1.0, 0.0),  # joint (v, t)
    (1.0, 1.0, 0.0, 0.0),  # visual only
    (1.0, 0.0, 1.0, 0.0),  # tactile only
    (1.0, 1.0, 1.0, 1.0),  # joint (v, t, p)
    (1.0, 1.0, 0.0, 1.0),  # (v, p)
    (1.0, 0.0, 1.0, 1.0),  # (t, p)
    (1.0, 0.0, 0.0, 1.0),  # pose only
)
VIS_LOSS_POSE = (0, 1, 3, 4)
TAC_LOSS_POSE = (0, 2, 3, 5)
POSE_LOSS_POSE = (3, 4, 5, 6)


def _img_recon_sum(recons, target, loss_mask):
    """Sum-reduced BCE-with-logits of (K, B, H, W, C) recons vs one target.
    Routed through fused_masked_bce_sum in the native conv-output shape (no
    layout-changing flatten): mask + BCE + reduce fuse into one pass over the
    logits (Pallas on TPU behind MMDYN_FUSED_BCE; XLA fusion otherwise)."""
    from mmdyn_tpu.ops.kernels import fused_masked_bce_sum

    return fused_masked_bce_sum(recons, target, loss_mask)


def _stacked_img_decode(model, variables, z_v, z_t, condition):
    """Decode the visual AND tactile subset batches through one launch.

    The two image decoders share an architecture; stacking their param trees
    on a leading axis and vmapping a bare ``Decoder`` over that axis turns
    the 2x(K deconvs) into grouped convolutions (feature_group_count=2 after
    XLA's conv batching rule), halving the kernel count per step. BatchNorm
    statistics stay per-(decoder, subset) because both vmap levels map rather
    than flatten. Enabled by ``MMDYN_STACKED_DECODE=1`` — A/B-measured on
    v5e, see docs/PARITY.md "dyn_modeling optimisation campaign".
    """
    from mmdyn_tpu.models.vae import Decoder

    dec = Decoder(latent_size=model.latent_size, architecture="cnn",
                  conditional=model.conditional,
                  categorical_conditions=model.categorical_conditions,
                  condition_dim=model.condition_dim,
                  compute_dtype=model.compute_dtype)
    p2 = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]),
        variables["params"]["visual_decoder"],
        variables["params"]["tactile_decoder"])
    z2 = jnp.stack([z_v, z_t])  # (2, K, B, D)

    def per_decoder(p, zk):
        return jax.vmap(lambda z1: dec.apply({"params": p}, z1, condition))(zk)

    out = jax.vmap(per_decoder)(p2, z2)  # (2, K, B, H, W, C)
    return out[0], out[1]


def _subset_decode(decode_fn, z_sel):
    """vmapped decode over the subset axis; MMDYN_DECODE_CHUNK=n splits it
    into sequential groups of n subsets (optimization_barrier-chained) to
    shrink the concurrently-live decode working set. A/B-measured on v5e —
    see docs/PARITY.md (the logits must outlive the forward for the backward
    pass either way, so this changes scheduling, not footprint)."""
    import os

    chunk = int(os.environ.get("MMDYN_DECODE_CHUNK", "0"))
    k = z_sel.shape[0]
    if chunk <= 0 or chunk >= k:
        return jax.vmap(decode_fn)(z_sel)
    outs = []
    for i in range(0, k, chunk):
        zz = z_sel[i:i + chunk]
        if outs:
            zz, _ = jax.lax.optimization_barrier((zz, outs[-1]))
        outs.append(jax.vmap(decode_fn)(zz))
    return jnp.concatenate(outs, axis=0)


def mvae_evaluate(model, variables, rng, inputs, targets, kl_weight, cfg):
    """Subset-ELBO loss + metrics for the MVAE (problems.py:473-546).

    Args:
        inputs:  dict with 'visual', 'tactile' (B,H,W,C), optional 'pose'
                 (B,7), optional 'shock'.
        targets: dict with 'visual', 'tactile', optional 'pose', optional
                 'loss_mask'.
        cfg:     ProblemConfig (static).

    Returns:
        (loss, aux) where aux holds 'recon_x' (joint reconstructions for
        logging) and 'perf_measure' (mean BCE / MSE per modality, as the
        reference logs from the single-modality passes, problems.py:499-535).
    """
    use_pose = cfg.use_pose
    visual, tactile = inputs["visual"], inputs["tactile"]
    pose = inputs.get("pose") if use_pose else None
    condition = inputs.get("shock") if cfg.conditional else None
    t_v, t_t = targets["visual"], targets["tactile"]
    t_p = targets.get("pose") if use_pose else None
    loss_mask = targets.get("loss_mask") if cfg.mask_loss else None

    kd_v, kd_t, k_rep = jax.random.split(rng, 3)
    mcls = type(model)

    def apply(method, *args, **kwargs):
        return model.apply(variables, *args, method=method, **kwargs)

    mu_v, lv_v = apply(mcls.encode_visual, visual, condition,
                       rngs={"dropout": kd_v})
    mu_t, lv_t = apply(mcls.encode_tactile, tactile, condition,
                       rngs={"dropout": kd_t})
    experts_mu = [jnp.zeros_like(mu_v), mu_v, mu_t]
    experts_lv = [jnp.zeros_like(lv_v), lv_v, lv_t]
    if use_pose:
        mu_p, lv_p = apply(mcls.encode_pose, pose)
        experts_mu.append(mu_p)
        experts_lv.append(lv_p)

    mu_m = jnp.stack(experts_mu)      # (M, B, D)
    lv_m = jnp.stack(experts_lv)

    subsets = jnp.array(SUBSETS_POSE if use_pose else SUBSETS_NO_POSE)
    # fused PoE + reparameterisation over all subsets (Pallas on TPU); the
    # (K, B, D) noise matches what reparametrize(k_rep, ...) would draw
    noise_shape = (subsets.shape[0],) + mu_v.shape
    if getattr(cfg, "noise_free", False):
        noise = jnp.zeros(noise_shape, mu_v.dtype)   # z = pd_mu (diagnostic)
    else:
        noise = jax.random.normal(k_rep, noise_shape, mu_v.dtype)
    z, pd_mu, pd_lv = fused_poe_reparam(mu_m, lv_m, subsets, noise)

    vis_idx = jnp.array(VIS_LOSS_POSE if use_pose else VIS_LOSS_NO_POSE)
    tac_idx = jnp.array(TAC_LOSS_POSE if use_pose else TAC_LOSS_NO_POSE)

    import os

    if (os.environ.get("MMDYN_STACKED_DECODE", "0") == "1"
            and model.architecture == "cnn"):
        recon_v, recon_t = _stacked_img_decode(model, variables,
                                               z[vis_idx], z[tac_idx],
                                               condition)
    else:
        recon_v = _subset_decode(
            lambda zz: apply(mcls.decode_visual, zz, condition), z[vis_idx])
        recon_t = _subset_decode(
            lambda zz: apply(mcls.decode_tactile, zz, condition), z[tac_idx])

    batch_size = visual.shape[0]
    recon_error = (_img_recon_sum(recon_v, t_v, loss_mask)
                   + _img_recon_sum(recon_t, t_t, loss_mask))
    if use_pose:
        pose_idx = jnp.array(POSE_LOSS_POSE)
        recon_p = jax.vmap(lambda zz: apply(mcls.decode_pose, zz))(z[pose_idx])
        tp = jnp.broadcast_to(t_p[None], recon_p.shape)
        recon_error = recon_error + cfg.pose_multiplier * mse(recon_p, tp, "sum")

    # KLD summed over every subset's posterior == sum of per-pass KLDs
    kld = kl_divergence(pd_mu, pd_lv)
    loss = (recon_error + kl_weight * kld) / batch_size

    # metrics from the single-modality passes (problems.py:499-503, 534-535)
    perf = {
        "visual": jax.lax.stop_gradient(
            bce_with_logits(recon_v[1], t_v, "mean")),
        "tactile": jax.lax.stop_gradient(
            bce_with_logits(recon_t[1], t_t, "mean")),
    }
    recon_x = {
        # joint reconstructions for image logging; with pose the reference
        # logs the 3-modality joint pass (problems.py:507-512, 537)
        "visual": recon_v[2 if use_pose else 0],
        "tactile": recon_t[2 if use_pose else 0],
    }
    if use_pose:
        perf["pose"] = jax.lax.stop_gradient(mse(recon_p[3], t_p, "mean"))
        recon_x["pose"] = recon_p[0]

    return loss, {"recon_x": recon_x, "perf_measure": perf,
                  "means": pd_mu[0], "log_var": pd_lv[0]}


def vae_evaluate(model, variables, rng, inputs, targets, kl_weight, cfg):
    """VAE ELBO loss + metrics (problems.py:683-716 for seq_modeling; the
    plain reconstruction path problems.py:460-471 is the targets==inputs
    special case)."""
    from mmdyn_tpu.ops.losses import elbo_loss  # local to avoid cycle noise

    x = inputs["x"]
    condition = inputs.get("shock") if cfg.conditional else None
    target = targets["x"]
    loss_mask = targets.get("loss_mask") if cfg.mask_loss else None

    kd, kr = jax.random.split(rng)
    recon, mu, lv = model.apply(variables, x, condition,
                                rngs={"dropout": kd, "reparam": kr})
    loss = elbo_loss(recon, target, mu, lv, kl_weight=kl_weight,
                     loss_mask=loss_mask)
    perf = {cfg.input_type: jax.lax.stop_gradient(
        bce_with_logits(jnp.reshape(recon, target.shape), target, "mean"))}
    return loss, {"recon_x": jnp.reshape(recon, target.shape),
                  "perf_measure": perf, "means": mu, "log_var": lv}


def regression_evaluate(model, variables, rng, inputs, targets, kl_weight, cfg):
    """MSE-sum pose regression (problems.py:318-331). kl_weight unused."""
    x = inputs["x"]
    condition = inputs.get("shock") if cfg.conditional else None
    target = targets["pose"]
    out = model.apply(variables, x, condition, rngs={"dropout": rng})
    out = jnp.reshape(out, target.shape)
    loss = mse(out, target, "sum")
    perf = {"pose": jax.lax.stop_gradient(mse(out, target, "mean"))}
    return loss, {"outputs": out, "perf_measure": perf}
