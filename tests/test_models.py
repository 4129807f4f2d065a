"""Shape / geometry / layer-parity tests for the model family."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mmdyn_tpu.models import MVAE, VAE, Encoder, Decoder, Regressor, setup_model, count_parameters
from mmdyn_tpu.models.layers import Conv2d, ConvTranspose2d, TrainBatchNorm


def _rngs(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 3)
    return {"params": ks[0], "dropout": ks[1], "reparam": ks[2]}


class TestLayers:
    def test_conv_matches_torch(self):
        """Conv2d(k=4, s=2, p=1) parity against torch with shared weights."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
        layer = Conv2d(8, 4, 2, 1, use_bias=False)
        params = layer.init(jax.random.PRNGKey(0), jnp.array(x))
        kernel = np.asarray(params["params"]["kernel"])  # (kh, kw, in, out)

        got = layer.apply(params, jnp.array(x))
        tw = torch.tensor(kernel.transpose(3, 2, 0, 1))  # (out, in, kh, kw)
        want = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), tw, stride=2, padding=1)
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("stride,padding,in_hw,out_hw", [
        (1, 0, 5, 8),    # vae.py:268 ConvTranspose2d(256,128,4,1,0): 5 -> 8
        (2, 1, 8, 16),   # vae.py:271: 8 -> 16
    ])
    def test_convtranspose_geometry_and_torch_parity(self, stride, padding, in_hw, out_hw):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, in_hw, in_hw, 4)).astype(np.float32)
        layer = ConvTranspose2d(6, 4, stride, padding, use_bias=False)
        params = layer.init(jax.random.PRNGKey(0), jnp.array(x))
        kernel = np.asarray(params["params"]["kernel"])  # (kh, kw, in, out)
        got = layer.apply(params, jnp.array(x))
        assert got.shape == (2, out_hw, out_hw, 6)

        # torch weight w[i, o, a, b] = kernel[kh-1-a, kw-1-b, i, o]
        tw = torch.tensor(kernel[::-1, ::-1].copy().transpose(2, 3, 0, 1))
        want = F.conv_transpose2d(torch.tensor(x.transpose(0, 3, 1, 2)), tw,
                                  stride=stride, padding=padding)
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)

    def test_subpixel_deconv_matches_dilated(self, monkeypatch):
        """The MMDYN_DECONV=subpixel lowering of (k=4, s=2, p=1) must agree
        with the default dilated lowering (forward and gradients) — the
        elided dilation taps are exact zeros."""
        from mmdyn_tpu.models.layers import _deconv_k4s2p1_subpixel

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(4, 4, 4, 6)).astype(np.float32))

        def dilated(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), [(2, 2)] * 2, lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        a = dilated(x, k)
        b = _deconv_k4s2p1_subpixel(x, k, 6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
        ga = jax.grad(lambda x, k: jnp.sum(jnp.sin(dilated(x, k))),
                      argnums=(0, 1))(x, k)
        gb = jax.grad(
            lambda x, k: jnp.sum(jnp.sin(_deconv_k4s2p1_subpixel(x, k, 6))),
            argnums=(0, 1))(x, k)
        for u, v in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-4, atol=1e-5)

        # the env switch routes the layer through the subpixel path
        monkeypatch.setenv("MMDYN_DECONV", "subpixel")
        layer = ConvTranspose2d(6, 4, 2, 1, use_bias=False)
        params = layer.init(jax.random.PRNGKey(0), x)
        got_sp = layer.apply(params, x)
        monkeypatch.setenv("MMDYN_DECONV", "dilated")
        got_dil = layer.apply(params, x)
        np.testing.assert_allclose(np.asarray(got_sp), np.asarray(got_dil),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("stride,padding", [(1, 0), (2, 1), (3, 2)])
    def test_stridedgrad_deconv_matches_autodiff(self, monkeypatch, stride,
                                                 padding):
        """MMDYN_DECONV=stridedgrad (hand-derived reverse-free backward) must
        agree with XLA autodiff of the dilated lowering — forward bit-exact,
        gradients to accumulation order — including under vmap (the
        subset-decode usage)."""
        from mmdyn_tpu.models.layers import _deconv_impl, _deconv_stridedgrad

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(2, 7, 7, 3)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(4, 4, 3, 5)).astype(np.float32))

        a = _deconv_impl(x, k, stride, padding)
        b = _deconv_stridedgrad(x, k, stride, padding)
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        ga = jax.grad(lambda x, k: jnp.sum(jnp.sin(
            _deconv_impl(x, k, stride, padding))), argnums=(0, 1))(x, k)
        gb = jax.grad(lambda x, k: jnp.sum(jnp.sin(
            _deconv_stridedgrad(x, k, stride, padding))), argnums=(0, 1))(x, k)
        for u, v in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-4, atol=1e-5)

        # vmapped over a leading (subset) axis, as problems/reconstruction
        # uses it
        xs = jnp.stack([x, x + 1.0])
        gva = jax.grad(lambda xs, k: jnp.sum(jax.vmap(
            lambda xx: _deconv_impl(xx, k, stride, padding))(xs) ** 2),
            argnums=(0, 1))(xs, k)
        gvb = jax.grad(lambda xs, k: jnp.sum(jax.vmap(
            lambda xx: _deconv_stridedgrad(xx, k, stride, padding))(xs) ** 2),
            argnums=(0, 1))(xs, k)
        for u, v in zip(gva, gvb):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-3, atol=1e-2)

        # the env switch routes the layer through the custom-vjp path
        monkeypatch.setenv("MMDYN_DECONV", "stridedgrad")
        layer = ConvTranspose2d(5, 4, stride, padding, use_bias=False)
        params = layer.init(jax.random.PRNGKey(0), x)
        got_sg = layer.apply(params, x)
        monkeypatch.setenv("MMDYN_DECONV", "dilated")
        got_dil = layer.apply(params, x)
        np.testing.assert_array_equal(np.asarray(got_sg), np.asarray(got_dil))

    @pytest.mark.parametrize("shape,dt", [((8, 6, 6, 5), "float32"),
                                          ((4, 3, 3, 7), "bfloat16"),
                                          ((16, 9), "float32")])
    def test_train_bn_manual_vjp_matches_autodiff(self, shape, dt):
        """The hand-derived two-pass BN backward (MMDYN_BN_VJP=manual, the
        default) must agree with XLA autodiff of the statistics graph:
        forward bit-exact, gradients to accumulation order."""
        from mmdyn_tpu.models.layers import (_train_bn_fwd_math,
                                             _train_bn_manual)

        dtype = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(2.0, 3.0, size=shape), dtype)
        g = jnp.asarray(rng.normal(1.0, 0.2, size=shape[-1:]), jnp.float32)
        b = jnp.asarray(rng.normal(size=shape[-1:]), jnp.float32)

        ya = _train_bn_manual(x, g, b, 1e-5)
        yb = _train_bn_fwd_math(x, g, b, 1e-5)[0]
        np.testing.assert_array_equal(np.asarray(ya, np.float32),
                                      np.asarray(yb, np.float32))

        f_man = lambda x, g, b: jnp.sum(jnp.sin(
            _train_bn_manual(x, g, b, 1e-5).astype(jnp.float32)))
        f_aut = lambda x, g, b: jnp.sum(jnp.sin(
            _train_bn_fwd_math(x, g, b, 1e-5)[0].astype(jnp.float32)))
        ga = jax.grad(f_man, argnums=(0, 1, 2))(x, g, b)
        gb = jax.grad(f_aut, argnums=(0, 1, 2))(x, g, b)
        rtol, atol = ((5e-2, 5e-3) if dt == "bfloat16" else (1e-5, 1e-4))
        for u, v in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(u, np.float32),
                                       np.asarray(v, np.float32),
                                       rtol=rtol, atol=atol)

    def test_train_bn_stopgrad_stats_forward_bitexact(self, monkeypatch):
        """MMDYN_BN_STOPGRAD_STATS is a perf ablation that must keep the
        forward bit-exact (only the backward stat terms are removed) and the
        scale/bias gradients unchanged — the decomposition in docs/PARITY.md
        "BN statistics traffic" relies on both properties."""
        from mmdyn_tpu.models.layers import TrainBatchNorm

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(1.0, 2.0, size=(8, 6, 6, 16)), jnp.float32)
        bn = TrainBatchNorm()
        params = bn.init(jax.random.PRNGKey(0), x)

        def loss(p, x):
            return jnp.sum(jnp.sin(bn.apply(p, x)))

        monkeypatch.delenv("MMDYN_BN_STOPGRAD_STATS", raising=False)
        y0 = bn.apply(params, x)
        g0 = jax.grad(loss)(params, x)
        monkeypatch.setenv("MMDYN_BN_STOPGRAD_STATS", "1")
        y1 = bn.apply(params, x)
        g1 = jax.grad(loss)(params, x)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
        for k in ("scale", "bias"):
            np.testing.assert_allclose(
                np.asarray(g0["params"][k]), np.asarray(g1["params"][k]),
                rtol=1e-6, atol=1e-6)

    def test_train_batchnorm_matches_torch_train_mode(self):
        rng = np.random.default_rng(2)
        x = rng.normal(2.0, 3.0, size=(8, 6, 6, 5)).astype(np.float32)
        layer = TrainBatchNorm()
        params = layer.init(jax.random.PRNGKey(0), jnp.array(x))
        got = layer.apply(params, jnp.array(x))
        bn = torch.nn.BatchNorm2d(5)
        bn.train()
        want = bn(torch.tensor(x.transpose(0, 3, 1, 2))).detach()
        np.testing.assert_allclose(
            np.asarray(got), want.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4)


class TestEncoderDecoder:
    def test_cnn_encoder_shapes(self):
        enc = Encoder(latent_size=256, architecture="cnn")
        x = jnp.zeros((4, 64, 64, 3))
        params = enc.init(_rngs(), x)
        mu, lv = enc.apply(params, x, rngs={"dropout": jax.random.PRNGKey(1)})
        assert mu.shape == (4, 256) and lv.shape == (4, 256)

    def test_cnn_decoder_shapes(self):
        dec = Decoder(latent_size=256, architecture="cnn")
        z = jnp.zeros((4, 256))
        params = dec.init(_rngs(), z)
        out = dec.apply(params, z)
        assert out.shape == (4, 64, 64, 3)

    def test_mlp_pose_pathway_shapes(self):
        enc = Encoder(latent_size=256, architecture="mlp", input_dim=7,
                      layer_sizes=(512, 512))
        pose = jnp.zeros((4, 7))
        params = enc.init(_rngs(), pose)
        mu, lv = enc.apply(params, pose)
        assert mu.shape == (4, 256)
        dec = Decoder(latent_size=256, architecture="mlp", output_dim=7,
                      layer_sizes=(512, 512))
        dparams = dec.init(_rngs(), jnp.zeros((4, 256)))
        out = dec.apply(dparams, jnp.zeros((4, 256)))
        assert out.shape == (4, 7)

    def test_conditional_encoder(self):
        enc = Encoder(latent_size=16, architecture="cnn", conditional=True,
                      condition_dim=2)
        x = jnp.zeros((4, 64, 64, 3))
        c = jnp.zeros((4, 2))
        params = enc.init(_rngs(), x, c)
        mu, _ = enc.apply(params, x, c, rngs={"dropout": jax.random.PRNGKey(1)})
        assert mu.shape == (4, 16)


class TestModels:
    def test_vae_forward(self):
        model = VAE(latent_size=32, architecture="cnn")
        x = jnp.zeros((2, 64, 64, 3))
        params = model.init(_rngs(), x)
        recon, mu, lv = model.apply(
            params, x, rngs={"dropout": jax.random.PRNGKey(1),
                             "reparam": jax.random.PRNGKey(2)})
        assert recon.shape == (2, 64, 64, 3)
        assert mu.shape == (2, 32)

    def test_mvae_joint_forward_with_pose(self):
        model = MVAE(latent_size=32, use_pose=True)
        v = jnp.zeros((2, 64, 64, 3))
        t = jnp.zeros((2, 64, 64, 3))
        pose = jnp.zeros((2, 7))
        params = model.init(_rngs(), [v, t], pose)
        vr, tr, pr, mu, lv = model.apply(
            params, [v, t], pose,
            rngs={"dropout": jax.random.PRNGKey(1), "reparam": jax.random.PRNGKey(2)})
        assert vr.shape == (2, 64, 64, 3)
        assert tr.shape == (2, 64, 64, 3)
        assert pr.shape == (2, 7)
        assert mu.shape == (2, 32)

    def test_mvae_missing_modalities(self):
        model = MVAE(latent_size=16, use_pose=False)
        v = jnp.zeros((2, 64, 64, 3))
        t = jnp.zeros((2, 64, 64, 3))
        params = model.init(_rngs(), [v, t])
        vr, tr, pr, mu, lv = model.apply(
            params, [v, None],
            rngs={"dropout": jax.random.PRNGKey(1), "reparam": jax.random.PRNGKey(2)})
        assert pr is None and vr.shape == (2, 64, 64, 3)

    def test_regressor(self):
        model = Regressor(out_dim=7)
        x = jnp.zeros((3, 64, 64, 3))
        params = model.init(_rngs(), x)
        out = model.apply(params, x, rngs={"dropout": jax.random.PRNGKey(1)})
        assert out.shape == (3, 7)

    def test_factory(self):
        m = setup_model("cnn-mvae", cross_modal=True, latent_size=8)
        assert isinstance(m, MVAE)
        m = setup_model("cnn-vae", cross_modal=False, latent_size=8, architecture="cnn")
        assert isinstance(m, VAE)
        m = setup_model("regressor", out_dim=7)
        assert isinstance(m, Regressor)
        with pytest.raises(AssertionError):
            setup_model("cnn-vae", cross_modal=True)

    def test_parameter_count_matches_torch_encoder(self):
        """Conv trunk + FC + heads should have the same #params as reference."""
        enc = Encoder(latent_size=256, architecture="cnn")
        params = enc.init(_rngs(), jnp.zeros((1, 64, 64, 3)))
        got = count_parameters(params["params"])
        # torch: convs (no bias) + 3 BN (scale+bias) + fc 6400->512 (+b)
        #        + 2 heads 512->256 (+b)
        want = (
            4 * 4 * 3 * 32 + 4 * 4 * 32 * 64 + 4 * 4 * 64 * 128 + 4 * 4 * 128 * 256
            + 2 * (64 + 128 + 256)
            + 6400 * 512 + 512
            + 2 * (512 * 256 + 256)
        )
        assert got == want
