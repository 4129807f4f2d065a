"""Cross-framework golden tests for the problem layer.

The crown jewel: our vectorised subset-ELBO (mvae_evaluate) vs a torch
re-implementation of the reference's sequential 3-/7-pass evaluation, with
identical transplanted weights and noise-free reparameterisation.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mmdyn_tpu.models import MVAE
from mmdyn_tpu.problems import ProblemConfig, anneal_kl, parse_batch
from mmdyn_tpu.problems import reconstruction as recon_mod
from mmdyn_tpu.problems.transforms import dyn_roll, dyn_targets, flatten_seq, stride_first

from tests.torch_reference import GoldMVAE, gold_mvae_evaluate, load_mvae


def _rngs(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {"params": ks[0], "dropout": ks[1], "reparam": ks[2]}


@pytest.mark.parametrize("use_pose", [False, True])
def test_mvae_subset_elbo_matches_torch_reference(monkeypatch, use_pose):
    """Vectorised subset evaluation == reference sequential passes (noise-free)."""
    latent, B = 16, 4
    rng = np.random.default_rng(0)
    xv = rng.uniform(size=(B, 64, 64, 3)).astype(np.float32)
    xt = rng.uniform(size=(B, 64, 64, 3)).astype(np.float32)
    xp = rng.normal(size=(B, 7)).astype(np.float32)

    model = MVAE(latent_size=latent, use_pose=use_pose, dropout_rate=0.0)
    args = ([jnp.array(xv), jnp.array(xt)],)
    kwargs = {"pose": jnp.array(xp)} if use_pose else {}
    variables = model.init(_rngs(), *args, **kwargs)

    # noise-free reparam in our path (kill both the composed and fused routes)
    monkeypatch.setattr(recon_mod, "reparametrize", lambda rng, mu, lv: mu)
    real_fused = recon_mod.fused_poe_reparam
    monkeypatch.setattr(
        recon_mod, "fused_poe_reparam",
        lambda mu, lv, mask, noise: real_fused(mu, lv, mask,
                                               jnp.zeros_like(noise)))

    cfg = ProblemConfig(problem_type="seq_modeling", model_name="cnn-mvae",
                        input_type="visuotactile", use_pose=use_pose,
                        kl_weight=0.7, pose_multiplier=50.0, latent_size=latent)
    inputs = {"visual": jnp.array(xv), "tactile": jnp.array(xt)}
    targets = {"visual": jnp.array(xv), "tactile": jnp.array(xt)}
    if use_pose:
        inputs["pose"] = jnp.array(xp)
        targets["pose"] = jnp.array(xp)
    loss, aux = recon_mod.mvae_evaluate(
        model, variables, jax.random.PRNGKey(1), inputs, targets,
        kl_weight=0.7, cfg=cfg)

    gold = GoldMVAE(latent_size=latent, use_pose=use_pose)
    load_mvae(gold, jax.tree_util.tree_map(np.asarray, variables["params"]))
    with torch.no_grad():
        want = gold_mvae_evaluate(
            gold, torch.tensor(xv.transpose(0, 3, 1, 2)),
            torch.tensor(xt.transpose(0, 3, 1, 2)),
            torch.tensor(xp) if use_pose else None,
            kl_weight=0.7, pose_multiplier=50.0)

    assert float(loss) == pytest.approx(float(want), rel=2e-4)
    # sanity on aux structure
    assert aux["recon_x"]["visual"].shape == (B, 64, 64, 3)
    for v in aux["perf_measure"].values():
        assert np.isfinite(float(v))


@pytest.mark.parametrize("use_pose", [False, True])
def test_stacked_decode_matches_per_modality(monkeypatch, use_pose):
    """MMDYN_STACKED_DECODE=1 (one grouped launch over both image decoders)
    is numerically the per-modality vmapped path, forward and gradient."""
    latent, B = 16, 4
    rng = np.random.default_rng(2)
    xv = rng.uniform(size=(B, 64, 64, 3)).astype(np.float32)
    xt = rng.uniform(size=(B, 64, 64, 3)).astype(np.float32)
    xp = rng.normal(size=(B, 7)).astype(np.float32)

    model = MVAE(latent_size=latent, use_pose=use_pose, dropout_rate=0.0)
    args = ([jnp.array(xv), jnp.array(xt)],)
    kwargs = {"pose": jnp.array(xp)} if use_pose else {}
    variables = model.init(_rngs(5), *args, **kwargs)

    cfg = ProblemConfig(problem_type="seq_modeling", model_name="cnn-mvae",
                        input_type="visuotactile", use_pose=use_pose,
                        latent_size=latent)
    inputs = {"visual": jnp.array(xv), "tactile": jnp.array(xt)}
    targets = {"visual": jnp.array(xv), "tactile": jnp.array(xt)}
    if use_pose:
        inputs["pose"] = jnp.array(xp)
        targets["pose"] = jnp.array(xp)
    key = jax.random.PRNGKey(7)

    def loss_fn(params):
        loss, aux = recon_mod.mvae_evaluate(
            model, {"params": params}, key, inputs, targets,
            kl_weight=1.0, cfg=cfg)
        return loss, aux

    monkeypatch.setenv("MMDYN_STACKED_DECODE", "0")
    (l0, aux0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    monkeypatch.setenv("MMDYN_STACKED_DECODE", "1")
    (l1, aux1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])

    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    for k in aux0["recon_x"]:
        np.testing.assert_allclose(np.asarray(aux0["recon_x"][k]),
                                   np.asarray(aux1["recon_x"][k]),
                                   atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


class TestTransforms:
    def test_stride_first_equals_flat_stride(self):
        """[:, 0] == flat[::T] (problems.py:648)."""
        x = np.arange(2 * 5 * 3).reshape(2, 5, 3).astype(np.float32)
        got = np.asarray(stride_first(jnp.array(x)))
        flat = x.reshape(-1, 3)
        np.testing.assert_array_equal(got, flat[::5])

    def test_dyn_targets_match_torch_roll_with_patch(self):
        """dyn_targets == torch.roll(flat, -1, 0) with [l-1::l] patched."""
        B, T = 3, 4
        x = np.random.default_rng(0).normal(size=(B, T, 2, 2, 3)).astype(np.float32)
        final = np.random.default_rng(1).normal(size=(B, 2, 2, 3)).astype(np.float32)
        got = np.asarray(dyn_targets(jnp.array(x), jnp.array(final)))

        flat = torch.tensor(x.reshape(B * T, 2, 2, 3))
        want = torch.roll(flat, -1, dims=0)
        # patch: final frame of each sequence -> resting frame (problems.py:778)
        want[T - 1::T] = torch.tensor(final)
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-6)

    def test_dyn_roll_pose_without_patch(self):
        """Pose targets keep the reference's unpatched roll (problems.py:798)."""
        B, T = 2, 3
        pose = np.arange(B * T * 7).reshape(B, T, 7).astype(np.float32)
        got = np.asarray(dyn_roll(jnp.array(pose)))
        want = torch.roll(torch.tensor(pose.reshape(-1, 7)), -1, dims=0).numpy()
        np.testing.assert_array_equal(got, want)

    def test_flatten_matches_collate(self):
        x = np.random.default_rng(2).normal(size=(4, 6, 8)).astype(np.float32)
        got = np.asarray(flatten_seq(jnp.array(x)))
        np.testing.assert_array_equal(got, x.reshape(24, 8))


class TestAugment:
    def _batch(self, B=4, T=3):
        rng = np.random.default_rng(3)
        f = lambda *s: jnp.array(rng.uniform(size=s).astype(np.float32))
        return {
            "visual": f(B, T, 16, 16, 3), "tactile": f(B, T, 16, 16, 3),
            "final_visual": f(B, 16, 16, 3), "final_tactile": f(B, 16, 16, 3),
            "seg": f(B, T, 16, 16, 3), "avail": f(B, T, 2),
        }

    def test_shapes_range_and_determinism(self):
        from mmdyn_tpu.problems.transforms import augment_batch
        batch = self._batch()
        key = jax.random.PRNGKey(7)
        out = augment_batch(batch, key)
        for k, v in batch.items():
            assert out[k].shape == v.shape
        assert float(jnp.min(out["visual"])) >= 0.0
        assert float(jnp.max(out["visual"])) <= 1.0
        # same key -> identical; different key -> different
        again = augment_batch(batch, key)
        np.testing.assert_array_equal(np.asarray(out["visual"]),
                                      np.asarray(again["visual"]))
        other = augment_batch(batch, jax.random.PRNGKey(8))
        assert not np.array_equal(np.asarray(out["visual"]),
                                  np.asarray(other["visual"]))
        # non-image fields untouched
        np.testing.assert_array_equal(np.asarray(out["avail"]),
                                      np.asarray(batch["avail"]))

    def test_geometry_coherent_across_fields(self):
        """seg / finals get the identical flip+shift as the frames (brightness
        must not touch seg), so dynamics targets stay aligned."""
        from mmdyn_tpu.problems.transforms import augment_batch
        batch = self._batch()
        # make every image field identical so any geometric transform must
        # map them identically
        same_seq = batch["visual"]
        batch = dict(batch, tactile=same_seq, seg=same_seq,
                     final_visual=same_seq[:, 0], final_tactile=same_seq[:, 0])
        out = augment_batch(batch, jax.random.PRNGKey(11), brightness=0.0)
        np.testing.assert_allclose(np.asarray(out["visual"]),
                                   np.asarray(out["seg"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out["visual"][:, 0]),
                                   np.asarray(out["final_visual"]), rtol=1e-6)

    def test_frames_share_sequence_transform(self):
        """All frames of one sequence see the same flip/shift (physical
        coherence of the rollout)."""
        from mmdyn_tpu.problems.transforms import augment_batch
        rng = np.random.default_rng(5)
        frame = rng.uniform(size=(4, 1, 16, 16, 3)).astype(np.float32)
        seq = jnp.array(np.repeat(frame, 3, axis=1))  # identical frames
        batch = {"visual": seq}
        out = np.asarray(augment_batch(batch, jax.random.PRNGKey(2))["visual"])
        np.testing.assert_allclose(out[:, 0], out[:, 1], rtol=1e-6)
        np.testing.assert_allclose(out[:, 0], out[:, 2], rtol=1e-6)

    def test_config_guards(self):
        # ValueError (not assert): must survive `python -O`
        with pytest.raises(ValueError):
            ProblemConfig(problem_type="seq_modeling", input_type="visuotactile",
                          use_pose=True, augment=True)
        with pytest.raises(ValueError):
            ProblemConfig(problem_type="regression", input_type="visual",
                          model_name="regressor", augment=True)
        # directional conditions (exp_3 lateral shock force) would decohere
        # under a mirror flip — conditional runs are rejected too
        with pytest.raises(ValueError):
            ProblemConfig(problem_type="seq_modeling", input_type="visual",
                          model_name="cnn-vae", conditional=True,
                          condition_dim=1, augment=True)


class TestParsing:
    def _batch(self, B=2, T=3, S=1):
        rng = np.random.default_rng(0)
        f = lambda *s: jnp.array(rng.uniform(size=s).astype(np.float32))
        return {
            "visual": f(B, T, 8, 8, 3), "tactile": f(B, T, 8, 8, 3),
            "pose": f(B, T, 7), "avail": f(B, T, 2), "shock": f(B, T, S),
            "final_visual": f(B, 8, 8, 3), "final_tactile": f(B, 8, 8, 3),
            "final_pose": f(B, 7), "seg": f(B, T, 8, 8, 3),
        }

    def test_seq_modeling_visuotactile_pose(self):
        cfg = ProblemConfig(problem_type="seq_modeling", input_type="visuotactile",
                            use_pose=True)
        inputs, targets = parse_batch(cfg, self._batch())
        assert inputs["visual"].shape == (2, 8, 8, 3)
        assert inputs["pose"].shape == (2, 7)
        assert targets["visual"].shape == (2, 8, 8, 3)
        assert targets["loss_mask"].shape == (2, 8, 8, 3)

    def test_seq_modeling_single_modality(self):
        cfg = ProblemConfig(problem_type="seq_modeling", input_type="tactile",
                            model_name="cnn-vae")
        inputs, targets = parse_batch(cfg, self._batch())
        assert inputs["x"].shape == (2, 8, 8, 3)
        assert targets["x"].shape == (2, 8, 8, 3)

    def test_dyn_modeling_flattens(self):
        cfg = ProblemConfig(problem_type="dyn_modeling", input_type="visuotactile",
                            use_pose=True)
        inputs, targets = parse_batch(cfg, self._batch())
        assert inputs["visual"].shape == (6, 8, 8, 3)
        assert targets["visual"].shape == (6, 8, 8, 3)
        assert targets["pose"].shape == (6, 7)

    def test_regression(self):
        cfg = ProblemConfig(problem_type="regression", input_type="visual",
                            model_name="regressor")
        inputs, targets = parse_batch(cfg, self._batch())
        assert inputs["x"].shape == (2, 8, 8, 3)
        assert targets["pose"].shape == (2, 7)

    def test_reconstruction_autoencodes(self):
        cfg = ProblemConfig(problem_type="reconstruction", input_type="visual",
                            model_name="cnn-vae")
        inputs, targets = parse_batch(cfg, self._batch())
        assert inputs["x"].shape == (6, 8, 8, 3)
        np.testing.assert_array_equal(np.asarray(inputs["x"]),
                                      np.asarray(targets["x"]))


def test_anneal_kl_schedule():
    """(epoch+1)/annealing capped at 1 (problems.py:212-216)."""
    assert anneal_kl(0, 50) == pytest.approx(1 / 50)
    assert anneal_kl(24, 50) == pytest.approx(0.5)
    assert anneal_kl(49, 50) == pytest.approx(1.0)
    assert anneal_kl(50, 50) == 1.0
    assert anneal_kl(99, 50) == 1.0
