"""Golden-value tests for core numerics vs the reference torch formulas."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mmdyn_tpu.ops import (
    bce_with_logits,
    elbo_loss,
    kl_divergence,
    masked_poe,
    mse,
    mvae_elbo_loss,
    product_of_experts,
    prior_expert,
    reparametrize,
)

RTOL = 1e-5


def _torch_poe(mu, logvar, eps=1e-8):
    """Reference ProductOfExperts.forward (vae.py:311-318)."""
    var = torch.exp(logvar) + eps
    T = 1.0 / (var + eps)
    pd_mu = torch.sum(mu * T, dim=0) / torch.sum(T, dim=0)
    pd_var = 1.0 / torch.sum(T, dim=0)
    pd_logvar = torch.log(pd_var + eps)
    return pd_mu, pd_logvar


class TestPoE:
    def test_matches_reference_formula(self):
        rng = np.random.default_rng(0)
        mu = rng.normal(size=(3, 4, 8)).astype(np.float32)
        logvar = rng.normal(size=(3, 4, 8)).astype(np.float32)
        got_mu, got_lv = product_of_experts(jnp.array(mu), jnp.array(logvar))
        want_mu, want_lv = _torch_poe(torch.tensor(mu), torch.tensor(logvar))
        np.testing.assert_allclose(np.asarray(got_mu), want_mu.numpy(), rtol=RTOL)
        np.testing.assert_allclose(np.asarray(got_lv), want_lv.numpy(), rtol=RTOL)

    def test_masked_poe_equals_subset_poe(self):
        """masked_poe with a 0/1 mask == PoE over the selected expert rows."""
        rng = np.random.default_rng(1)
        mu = jnp.array(rng.normal(size=(4, 5, 6)), jnp.float32)
        logvar = jnp.array(rng.normal(size=(4, 5, 6)), jnp.float32)
        mask = jnp.array([1.0, 0.0, 1.0, 1.0])
        got = masked_poe(mu, logvar, mask)
        want = product_of_experts(mu[jnp.array([0, 2, 3])],
                                  logvar[jnp.array([0, 2, 3])])
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), rtol=1e-4)

    def test_single_expert_with_prior(self):
        """PoE of {prior, one expert} shrinks towards zero mean."""
        mu = jnp.ones((1, 2, 3))
        logvar = jnp.zeros((1, 2, 3))
        pm, plv = prior_expert((1, 2, 3))
        out_mu, _ = product_of_experts(
            jnp.concatenate([pm, mu]), jnp.concatenate([plv, logvar]))
        np.testing.assert_allclose(np.asarray(out_mu), 0.5, rtol=1e-4)

    def test_reparam_statistics(self):
        mu = jnp.full((4096, 8), 2.0)
        logvar = jnp.full((4096, 8), np.log(0.25))
        z = reparametrize(jax.random.PRNGKey(0), mu, logvar)
        assert abs(float(jnp.mean(z)) - 2.0) < 0.05
        assert abs(float(jnp.std(z)) - 0.5) < 0.02


class TestLosses:
    def test_bce_with_logits_sum_matches_torch(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(7, 3, 9)).astype(np.float32)
        z = rng.uniform(size=(7, 3, 9)).astype(np.float32)
        got = float(bce_with_logits(jnp.array(x), jnp.array(z), "sum"))
        want = float(F.binary_cross_entropy_with_logits(
            torch.tensor(x), torch.tensor(z), reduction="sum"))
        assert got == pytest.approx(want, rel=RTOL)

    def test_bce_with_logits_mean_matches_torch(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(5, 11)).astype(np.float32)
        z = rng.uniform(size=(5, 11)).astype(np.float32)
        got = float(bce_with_logits(jnp.array(x), jnp.array(z), "mean"))
        want = float(F.binary_cross_entropy_with_logits(
            torch.tensor(x), torch.tensor(z), reduction="mean"))
        assert got == pytest.approx(want, rel=RTOL)

    def test_mse_matches_torch(self):
        rng = np.random.default_rng(4)
        a = rng.normal(size=(6, 7)).astype(np.float32)
        b = rng.normal(size=(6, 7)).astype(np.float32)
        got = float(mse(jnp.array(a), jnp.array(b), "sum"))
        want = float(F.mse_loss(torch.tensor(a), torch.tensor(b), reduction="sum"))
        assert got == pytest.approx(want, rel=RTOL)

    def test_kld_matches_reference_formula(self):
        rng = np.random.default_rng(5)
        mu = rng.normal(size=(4, 8)).astype(np.float32)
        logvar = rng.normal(size=(4, 8)).astype(np.float32)
        got = float(kl_divergence(jnp.array(mu), jnp.array(logvar)))
        tmu, tlv = torch.tensor(mu), torch.tensor(logvar)
        want = float(-0.5 * torch.sum(1 + tlv - tmu.pow(2) - tlv.exp()))
        assert got == pytest.approx(want, rel=RTOL)

    def test_elbo_loss_matches_reference(self):
        """(BCE_sum + w * KLD)/B per problems.py:401-419, incl. loss mask."""
        rng = np.random.default_rng(6)
        B = 4
        recon = rng.normal(size=(B, 8, 8, 3)).astype(np.float32)
        x = rng.uniform(size=(B, 8, 8, 3)).astype(np.float32)
        mask = (rng.uniform(size=(B, 8, 8, 3)) > 0.5).astype(np.float32)
        mu = rng.normal(size=(B, 5)).astype(np.float32)
        logvar = rng.normal(size=(B, 5)).astype(np.float32)
        kl_weight = 0.37

        for m in (None, mask):
            got = float(elbo_loss(jnp.array(recon), jnp.array(x),
                                  jnp.array(mu), jnp.array(logvar),
                                  kl_weight=kl_weight,
                                  loss_mask=None if m is None else jnp.array(m)))
            tr, tx = torch.tensor(recon), torch.tensor(x)
            tmu, tlv = torch.tensor(mu), torch.tensor(logvar)
            kld = -0.5 * torch.sum(1 + tlv - tmu.pow(2) - tlv.exp())
            if m is None:
                bce = F.binary_cross_entropy_with_logits(tr, tx, reduction="sum")
            else:
                tm = torch.tensor(m)
                bce = F.binary_cross_entropy_with_logits(tr * tm, tx * tm, reduction="sum")
            want = float((bce + kl_weight * kld) / B)
            assert got == pytest.approx(want, rel=RTOL)

    def test_mvae_elbo_loss_matches_reference(self):
        """Image -> BCE, vector -> pose_multiplier * MSE (problems.py:421-458)."""
        rng = np.random.default_rng(7)
        B, pm, klw = 3, 1000.0, 0.6
        rv = rng.normal(size=(B, 4, 4, 3)).astype(np.float32)
        xv = rng.uniform(size=(B, 4, 4, 3)).astype(np.float32)
        rp = rng.normal(size=(B, 7)).astype(np.float32)
        xp = rng.normal(size=(B, 7)).astype(np.float32)
        mu = rng.normal(size=(B, 5)).astype(np.float32)
        logvar = rng.normal(size=(B, 5)).astype(np.float32)

        got = float(mvae_elbo_loss(
            [jnp.array(rv), jnp.array(rp)], [jnp.array(xv), jnp.array(xp)],
            jnp.array(mu), jnp.array(logvar),
            kl_weight=klw, pose_multiplier=pm))

        kld = -0.5 * torch.sum(
            1 + torch.tensor(logvar) - torch.tensor(mu).pow(2) - torch.tensor(logvar).exp())
        bce = F.binary_cross_entropy_with_logits(
            torch.tensor(rv), torch.tensor(xv), reduction="sum")
        pmse = pm * F.mse_loss(torch.tensor(rp), torch.tensor(xp), reduction="sum")
        want = float((bce + pmse + klw * kld) / B)
        assert got == pytest.approx(want, rel=RTOL)
