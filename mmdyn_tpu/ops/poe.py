"""Product-of-experts Gaussian fusion and reparameterisation.

Numerical contract follows the reference exactly:

* PoE (mmdyn/pytorch/models/vae.py:304-318):
    var       = exp(logvar) + eps
    T         = 1 / (var + eps)          # note: eps applied twice, kept for parity
    pd_mu     = sum(mu * T, experts) / sum(T, experts)
    pd_var    = 1 / sum(T, experts)
    pd_logvar = log(pd_var + eps)
  with eps = 1e-8.

* Prior expert N(0, I) (vae.py:321-328): mu = logvar = 0.

* Reparameterisation (vae.py:52-61): z = eps * exp(0.5 * logvar) + mu,
  eps ~ N(0, I).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmdyn_tpu.config import POE_EPS


def prior_expert(shape, dtype=jnp.float32):
    """Universal N(0, I) prior expert: zero mean and zero log-variance."""
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def product_of_experts(mu, logvar, eps=POE_EPS):
    """Precision-weighted fusion of M Gaussian experts.

    Args:
        mu:     (M, ..., D) expert means (expert axis leading).
        logvar: (M, ..., D) expert log-variances.

    Returns:
        (pd_mu, pd_logvar), each (..., D).
    """
    var = jnp.exp(logvar) + eps
    t = 1.0 / (var + eps)
    sum_t = jnp.sum(t, axis=0)
    pd_mu = jnp.sum(mu * t, axis=0) / sum_t
    pd_var = 1.0 / sum_t
    pd_logvar = jnp.log(pd_var + eps)
    return pd_mu, pd_logvar


def masked_poe(mu, logvar, mask, eps=POE_EPS):
    """PoE over a *masked* subset of experts, vectorisable over subsets.

    This is the TPU-friendly form of the reference's "run the model once per
    modality subset" pattern (mmdyn/pytorch/problems/problems.py:473-529): the
    per-modality encoders run once, and each subset's posterior is obtained by
    masking out absent experts in precision space. The prior expert N(0, I)
    must be included as an always-on row of ``mu``/``logvar`` with mask 1.

    Args:
        mu:     (M, B, D) expert means.
        logvar: (M, B, D) expert log-variances.
        mask:   (M,) or (M, 1, 1) — 1.0 where the expert participates.

    Returns:
        (pd_mu, pd_logvar), each (B, D).
    """
    mask = jnp.reshape(mask, (-1,) + (1,) * (mu.ndim - 1)).astype(mu.dtype)
    var = jnp.exp(logvar) + eps
    t = mask / (var + eps)
    sum_t = jnp.sum(t, axis=0)
    pd_mu = jnp.sum(mu * t, axis=0) / sum_t
    pd_var = 1.0 / sum_t
    pd_logvar = jnp.log(pd_var + eps)
    return pd_mu, pd_logvar


def reparametrize(rng, mu, logvar):
    """z = eps * std + mu with eps ~ N(0, I) (vae.py:52-61)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, mu.shape, mu.dtype)
    return eps * std + mu
