"""ELBO losses with reference-exact reduction semantics.

The reference losses (mmdyn/pytorch/problems/problems.py:401-458):

* ``_elbo_loss``:  (BCE_with_logits_sum + kl_weight * KLD) / batch_size,
  where KLD = -0.5 * sum(1 + logvar - mu^2 - exp(logvar)) over ALL elements.
  An optional loss mask multiplies BOTH the logits and the targets before the
  BCE (problems.py:409-411) — an idiosyncrasy kept for parity.

* ``_mvae_elbo_loss``: sum over modalities of
  - images  (ndim > 2):   BCE-with-logits, sum reduction
  - vectors (ndim <= 2):  pose_multiplier * MSE, sum reduction
  plus kl_weight * KLD, all divided by batch_size.

All reductions are exact sums in float32, matching torch's
``reduction='sum'`` path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets, reduction="sum"):
    """Binary cross-entropy with logits, matching
    torch.nn.functional.binary_cross_entropy_with_logits.

    loss = max(x, 0) - x*z + log1p(exp(-|x|))

    bf16 logits (the bfloat16_full decoder output) are upcast elementwise so
    the loss math is always f32; the upcast fuses into the reduction.
    """
    logits = logits.astype(jnp.float32)
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    return loss


def mse(pred, targets, reduction="sum"):
    """Squared error matching torch.nn.functional.mse_loss."""
    loss = jnp.square(pred - targets)
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    return loss


def kl_divergence(mu, logvar):
    """KLD(q || N(0, I)) summed over all elements (problems.py:406)."""
    return -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))


def elbo_loss(recon_logits, x, mu, logvar, kl_weight=1.0, loss_mask=None):
    """VAE ELBO with reference semantics (problems.py:401-419).

    Returns (BCE_sum + kl_weight * KLD) / batch_size.
    """
    batch_size = x.shape[0]
    kld = kl_divergence(mu, logvar)
    recon = jnp.reshape(recon_logits, x.shape)
    if loss_mask is not None:
        recon = recon * loss_mask
        x = x * loss_mask
    bce = bce_with_logits(recon, x, reduction="sum")
    return (bce + kl_weight * kld) / batch_size


def mvae_elbo_loss(recons, xs, mu, logvar, kl_weight=1.0, pose_multiplier=1000.0,
                   loss_mask=None):
    """Subset-ELBO for the MVAE (problems.py:421-458).

    Args:
        recons: list of reconstruction arrays (logits for images, raw for pose).
        xs:     list of matching targets.
        mu, logvar: the PoE posterior for this modality subset.

    Image modalities (ndim > 2) use BCE-with-logits; vector modalities use
    pose_multiplier * MSE. All sum-reduced, + kl_weight * KLD, / batch_size.
    """
    assert len(recons) == len(xs)
    batch_size = xs[0].shape[0]
    kld = kl_divergence(mu, logvar)
    recon_error = 0.0
    for recon, x in zip(recons, xs):
        if recon.ndim > 2:
            recon = jnp.reshape(recon, x.shape)
            if loss_mask is not None:
                recon = recon * loss_mask
                x = x * loss_mask
            recon_error = recon_error + bce_with_logits(recon, x, reduction="sum")
        else:
            if loss_mask is not None:
                # matches problems.py:445-447 applying the mask regardless of
                # modality; for vectors the reference would broadcast-fail, so
                # in practice masks are only used with image modalities.
                recon = recon * loss_mask
                x = x * loss_mask
            recon_error = recon_error + pose_multiplier * mse(recon, x, reduction="sum")
    return (recon_error + kl_weight * kld) / batch_size
