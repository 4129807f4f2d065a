"""Tests for the fused PoE+reparam kernel: forward equivalence with the
composed masked_poe + reparametrize path, and analytic-VJP correctness against
autodiff of the reference jnp implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdyn_tpu.ops.kernels import _poe_reparam_jnp, fused_poe_reparam
from mmdyn_tpu.ops.losses import kl_divergence
from mmdyn_tpu.ops.poe import masked_poe, reparametrize
from mmdyn_tpu.problems.reconstruction import SUBSETS_POSE


def _data(seed=0, m=4, b=6, d=16):
    rng = np.random.default_rng(seed)
    mu = jnp.array(rng.normal(size=(m, b, d)).astype(np.float32))
    lv = jnp.array(rng.normal(size=(m, b, d)).astype(np.float32))
    mask = jnp.array(SUBSETS_POSE)  # (7, 4)
    noise = jnp.array(rng.normal(size=(7, b, d)).astype(np.float32))
    return mu, lv, mask, noise


class TestForward:
    def test_matches_masked_poe_composition(self):
        mu, lv, mask, noise = _data()
        z, pd_mu, pd_lv = fused_poe_reparam(mu, lv, mask, noise)

        want_mu, want_lv = jax.vmap(masked_poe, in_axes=(None, None, 0))(mu, lv, mask)
        np.testing.assert_allclose(np.asarray(pd_mu), np.asarray(want_mu),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pd_lv), np.asarray(want_lv),
                                   rtol=2e-5, atol=1e-6)
        want_z = want_mu + noise * jnp.exp(0.5 * want_lv)
        np.testing.assert_allclose(np.asarray(z), np.asarray(want_z),
                                   rtol=2e-5, atol=1e-6)

    def test_same_noise_as_reparametrize(self):
        """The (K,B,D) normal draw matches reparametrize with the same key."""
        mu, lv, mask, _ = _data()
        key = jax.random.PRNGKey(3)
        noise = jax.random.normal(key, (7, 6, 16))
        z, pd_mu, pd_lv = fused_poe_reparam(mu, lv, mask, noise)
        want = reparametrize(key, pd_mu, pd_lv)
        np.testing.assert_allclose(np.asarray(z), np.asarray(want), rtol=1e-6)


class TestBackward:
    def test_vjp_matches_autodiff(self):
        """Analytic VJP == autodiff of the jnp reference, through a loss that
        uses z, pd_mu and pd_lv (like the real subset-ELBO)."""
        mu, lv, mask, noise = _data(seed=1)

        def loss_fused(mu, lv):
            z, pd_mu, pd_lv = fused_poe_reparam(mu, lv, mask, noise)
            return (jnp.sum(jnp.sin(z) * z)
                    + kl_divergence(pd_mu, pd_lv)) / 7.0

        def loss_ref(mu, lv):
            z, pd_mu, pd_lv = _poe_reparam_jnp(mu, lv, mask, noise)
            return (jnp.sum(jnp.sin(z) * z)
                    + kl_divergence(pd_mu, pd_lv)) / 7.0

        v1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1))(mu, lv)
        v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1))(mu, lv)
        assert float(v1) == pytest.approx(float(v2), rel=1e-6)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   rtol=1e-4, atol=1e-6)

    def test_vjp_z_only(self):
        mu, lv, mask, noise = _data(seed=2)

        def f_fused(mu, lv):
            z, _, _ = fused_poe_reparam(mu, lv, mask, noise)
            return jnp.sum(z ** 2)

        def f_ref(mu, lv):
            z, _, _ = _poe_reparam_jnp(mu, lv, mask, noise)
            return jnp.sum(z ** 2)

        g1 = jax.grad(f_fused, argnums=(0, 1))(mu, lv)
        g2 = jax.grad(f_ref, argnums=(0, 1))(mu, lv)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   rtol=1e-4, atol=1e-6)

    def test_jittable(self):
        mu, lv, mask, noise = _data(seed=3)

        @jax.jit
        def f(mu, lv):
            z, pd_mu, pd_lv = fused_poe_reparam(mu, lv, mask, noise)
            return jnp.sum(z) + jnp.sum(pd_mu) + jnp.sum(pd_lv)

        assert np.isfinite(float(f(mu, lv)))


class TestFusedBCE:
    """fused_masked_bce_sum: jnp-path equivalence with the reference loss
    composition + analytic VJP vs autodiff (with and without mask)."""

    def _data(self, seed=0, k=4, b=6, p=256):
        rng = np.random.default_rng(seed)
        logits = jnp.array(rng.normal(size=(k, b, p)).astype(np.float32))
        target = jnp.array(rng.uniform(size=(b, p)).astype(np.float32))
        mask = jnp.array((rng.uniform(size=(b, p)) > 0.3).astype(np.float32))
        return logits, target, mask

    def test_matches_reference_composition(self):
        from mmdyn_tpu.ops.kernels import fused_masked_bce_sum
        from mmdyn_tpu.ops.losses import bce_with_logits
        logits, target, mask = self._data()
        got = fused_masked_bce_sum(logits, target, None)
        t = jnp.broadcast_to(target[None], logits.shape)
        want = bce_with_logits(logits, t, reduction="sum")
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    def test_masked_matches_reference_composition(self):
        from mmdyn_tpu.ops.kernels import fused_masked_bce_sum
        from mmdyn_tpu.ops.losses import bce_with_logits
        logits, target, mask = self._data(seed=2)
        got = fused_masked_bce_sum(logits, target, mask)
        m = mask[None]
        t = jnp.broadcast_to(target[None] * m, logits.shape)
        want = bce_with_logits(logits * m, t, reduction="sum")
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    @pytest.mark.parametrize("with_mask", [False, True])
    def test_vjp_matches_autodiff(self, with_mask):
        from mmdyn_tpu.ops.kernels import _bce_jnp, fused_masked_bce_sum
        logits, target, mask = self._data(seed=3)
        m = mask if with_mask else None
        g_fused = jax.grad(lambda x: fused_masked_bce_sum(x, target, m))(logits)
        g_auto = jax.grad(lambda x: _bce_jnp(x, target, m))(logits)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_auto),
                                   rtol=1e-5, atol=1e-6)

    def test_jittable_and_used_by_recon_loss(self):
        """_img_recon_sum routes through the fused op and stays equal to the
        parity-anchored loss value."""
        from mmdyn_tpu.problems.reconstruction import _img_recon_sum
        from mmdyn_tpu.ops.losses import bce_with_logits
        rng = np.random.default_rng(5)
        recons = jnp.array(rng.normal(size=(3, 4, 8, 8, 3)).astype(np.float32))
        target = jnp.array(rng.uniform(size=(4, 8, 8, 3)).astype(np.float32))
        got = jax.jit(_img_recon_sum, static_argnums=2)(recons, target, None)
        want = bce_with_logits(recons,
                               jnp.broadcast_to(target[None], recons.shape),
                               reduction="sum")
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
