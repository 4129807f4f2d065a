"""Checkpoint-compatibility tests.

1. Round-trip: flax params -> torch state_dict -> flax params is the identity.
2. Oracle test: the exported state_dict loads into the ACTUAL reference
   models (imported from the read-only reference tree, used purely as a test
   oracle) with strict=True, and the reference forward pass matches our
   forward pass with transplanted weights (noise-free, dropout off).
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mmdyn_tpu.models import MVAE, VAE, Regressor
from mmdyn_tpu.utils.torch_compat import (from_torch_state_dict,
                                          to_torch_state_dict)

REFERENCE_PATH = "/root/reference"


def _rngs(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return {"params": ks[0], "dropout": ks[1], "reparam": ks[2]}


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a)} != {set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], path + "/" + k)
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=path)


class TestRoundTrip:
    def test_mvae_roundtrip(self):
        model = MVAE(latent_size=16, use_pose=True, dropout_rate=0.0)
        v = jnp.zeros((2, 64, 64, 3))
        params = model.init(_rngs(), [v, v], jnp.zeros((2, 7)))["params"]
        params = jax.tree_util.tree_map(np.asarray, params)
        sd = to_torch_state_dict("cnn-mvae", params)
        back = from_torch_state_dict("cnn-mvae", sd)
        _tree_equal(params, back)

    def test_vae_roundtrip(self):
        model = VAE(latent_size=16, architecture="cnn")
        params = model.init(_rngs(), jnp.zeros((2, 64, 64, 3)))["params"]
        params = jax.tree_util.tree_map(np.asarray, params)
        back = from_torch_state_dict("cnn-vae", to_torch_state_dict("cnn-vae", params))
        _tree_equal(params, back)

    def test_regressor_roundtrip(self):
        model = Regressor(out_dim=7)
        params = model.init(_rngs(), jnp.zeros((2, 64, 64, 3)))["params"]
        params = jax.tree_util.tree_map(np.asarray, params)
        back = from_torch_state_dict("regressor",
                                     to_torch_state_dict("regressor", params))
        _tree_equal(params, back)


@pytest.fixture(scope="module")
def reference_models():
    """Import the reference model definitions as a naming/semantics oracle."""
    sys.path.insert(0, REFERENCE_PATH)
    try:
        from mmdyn.pytorch.models import vae as ref_vae
    except ImportError:
        pytest.skip("reference tree not importable")
    finally:
        sys.path.remove(REFERENCE_PATH)
    return ref_vae


class TestReferenceOracle:
    def test_exported_state_dict_loads_strict(self, reference_models):
        """Exported keys/shapes match the reference MVAE exactly."""
        model = MVAE(latent_size=32, use_pose=True, dropout_rate=0.0)
        v = jnp.zeros((2, 64, 64, 3))
        params = model.init(_rngs(), [v, v], jnp.zeros((2, 7)))["params"]
        sd = to_torch_state_dict(
            "cnn-mvae", jax.tree_util.tree_map(np.asarray, params))
        torch_sd = {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()}

        ref = reference_models.MVAE(use_pose=True, latent_size=32,
                                    architecture="cnn", encoder_hid=[256],
                                    decoder_hid=[256], condition_dim=0)
        missing, unexpected = ref.load_state_dict(torch_sd, strict=True), None
        assert not missing.missing_keys and not missing.unexpected_keys

    def test_forward_parity_with_reference(self, reference_models, monkeypatch):
        """Reference forward with our exported weights == our forward
        (noise-free, dropout off, train-mode BN)."""
        latent = 16
        model = MVAE(latent_size=latent, use_pose=True, dropout_rate=0.0)
        rng = np.random.default_rng(0)
        xv = rng.uniform(size=(3, 64, 64, 3)).astype(np.float32)
        xt = rng.uniform(size=(3, 64, 64, 3)).astype(np.float32)
        xp = rng.normal(size=(3, 7)).astype(np.float32)
        params = model.init(_rngs(), [jnp.array(xv), jnp.array(xt)],
                            jnp.array(xp))["params"]

        # ours, noise-free
        import mmdyn_tpu.models.vae as vae_mod
        monkeypatch.setattr(vae_mod, "reparametrize", lambda rng, mu, lv: mu)
        vr, tr, pr, mu, lv = model.apply(
            {"params": params}, [jnp.array(xv), jnp.array(xt)], jnp.array(xp),
            rngs={"dropout": jax.random.PRNGKey(1),
                  "reparam": jax.random.PRNGKey(2)})

        # reference, transplanted weights, dropout off, z = mu
        sd = to_torch_state_dict(
            "cnn-mvae", jax.tree_util.tree_map(np.asarray, params))
        torch_sd = {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()}
        ref = reference_models.MVAE(use_pose=True, latent_size=latent,
                                    architecture="cnn", encoder_hid=[256],
                                    decoder_hid=[256], condition_dim=0)
        ref.load_state_dict(torch_sd, strict=True)
        ref.train()
        for m in ref.modules():
            if isinstance(m, torch.nn.Dropout):
                m.eval()
        monkeypatch.setattr(type(ref), "reparametrize",
                            lambda self, means, log_var: means)
        # this torch build's oneDNN conv can return blocked-layout outputs on
        # which the reference's .view() fails; disable for the oracle run
        with torch.no_grad(), torch.backends.mkldnn.flags(enabled=False):
            rvr, rtr, rpr, rmu, rlv = ref(
                [torch.tensor(np.ascontiguousarray(xv.transpose(0, 3, 1, 2))),
                 torch.tensor(np.ascontiguousarray(xt.transpose(0, 3, 1, 2)))],
                pose=torch.tensor(xp))

        np.testing.assert_allclose(np.asarray(mu), rmu.numpy(), rtol=1e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(vr).transpose(0, 3, 1, 2),
                                   rvr.numpy(), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(tr).transpose(0, 3, 1, 2),
                                   rtr.numpy(), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pr), rpr.numpy(), rtol=1e-3,
                                   atol=1e-3)


    def test_forward_parity_with_reference_conditional(self, reference_models,
                                                       monkeypatch):
        """CVAE pathway oracle: shock concat into visual/tactile encoders
        (after the FC trunk, vae.py:195-196/:231-237) and decoders (onto z,
        vae.py:259/:285-291), pose unconditional (vae.py:118-123)."""
        latent, cond_dim = 16, 3
        model = MVAE(latent_size=latent, use_pose=True, dropout_rate=0.0,
                     conditional=True, condition_dim=cond_dim)
        rng = np.random.default_rng(1)
        xv = rng.uniform(size=(3, 64, 64, 3)).astype(np.float32)
        xt = rng.uniform(size=(3, 64, 64, 3)).astype(np.float32)
        xp = rng.normal(size=(3, 7)).astype(np.float32)
        xc = rng.uniform(size=(3, cond_dim)).astype(np.float32)
        params = model.init(_rngs(), [jnp.array(xv), jnp.array(xt)],
                            jnp.array(xp), jnp.array(xc))["params"]

        import mmdyn_tpu.models.vae as vae_mod
        monkeypatch.setattr(vae_mod, "reparametrize", lambda rng, mu, lv: mu)
        vr, tr, pr, mu, lv = model.apply(
            {"params": params}, [jnp.array(xv), jnp.array(xt)], jnp.array(xp),
            jnp.array(xc),
            rngs={"dropout": jax.random.PRNGKey(1),
                  "reparam": jax.random.PRNGKey(2)})

        sd = to_torch_state_dict(
            "cnn-mvae", jax.tree_util.tree_map(np.asarray, params))
        torch_sd = {k: torch.tensor(np.ascontiguousarray(v))
                    for k, v in sd.items()}
        ref = reference_models.MVAE(use_pose=True, latent_size=latent,
                                    architecture="cnn", encoder_hid=[256],
                                    decoder_hid=[256], conditional=True,
                                    condition_dim=cond_dim)
        res = ref.load_state_dict(torch_sd, strict=True)
        assert not res.missing_keys and not res.unexpected_keys
        ref.train()
        for m in ref.modules():
            if isinstance(m, torch.nn.Dropout):
                m.eval()
        monkeypatch.setattr(type(ref), "reparametrize",
                            lambda self, means, log_var: means)
        with torch.no_grad(), torch.backends.mkldnn.flags(enabled=False):
            rvr, rtr, rpr, rmu, rlv = ref(
                [torch.tensor(np.ascontiguousarray(xv.transpose(0, 3, 1, 2))),
                 torch.tensor(np.ascontiguousarray(xt.transpose(0, 3, 1, 2)))],
                pose=torch.tensor(xp), condition=torch.tensor(xc))

        np.testing.assert_allclose(np.asarray(mu), rmu.numpy(), rtol=1e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(vr).transpose(0, 3, 1, 2),
                                   rvr.numpy(), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(tr).transpose(0, 3, 1, 2),
                                   rtr.numpy(), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(pr), rpr.numpy(), rtol=1e-3,
                                   atol=1e-3)


def test_export_tool_end_to_end(tmp_path):
    """Train one epoch, export the checkpoint with the CLI tool, torch.load it."""
    import subprocess, sys as _sys
    from mmdyn_tpu.data.synthetic import make_compiled_arrays
    from mmdyn_tpu.problems.base import ProblemConfig
    from mmdyn_tpu.train.loop import Problem

    make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                         n_sequences=8, seq_length=2)
    cfg = ProblemConfig(problem_type="seq_modeling", model_name="cnn-vae",
                        input_type="visual", latent_size=8, batchsize=2,
                        num_epochs=1, annealing_epochs=1)
    problem = Problem(cfg, tmp_path / "ds", logs_root=str(tmp_path / "logs"),
                      tensorboard=False)
    problem.train()

    out = tmp_path / "exported.ckpt"
    env = dict(__import__("os").environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [_sys.executable, "tools/export_torch_ckpt.py", "export",
         "--run", str(problem.log_dir), "--model-name", "cnn-vae",
         "--out", str(out)],
        capture_output=True, text=True, env=env, cwd=str(
            __import__("pathlib").Path(__file__).resolve().parents[1]))
    assert r.returncode == 0, r.stderr
    blob = torch.load(out, map_location="cpu", weights_only=False)
    assert "model" in blob and "epoch" in blob and "loss" in blob
    assert any(k.startswith("encoder.conv_net") for k in blob["model"])
