"""VAE and multimodal VAE (product-of-experts), TPU-first.

Architectural parity with the reference (mmdyn/pytorch/models/vae.py), laid out
NHWC so convolutions tile directly onto the MXU:

* ``Encoder`` (vae.py:179-242): DCGAN conv trunk
  3 -> 32 -> 64 -> 128 (k=4, s=2, p=1) -> 256 (k=4, s=1, p=0), Swish,
  BatchNorm after all but the first conv, no conv biases; FC 6400 -> 512 +
  Swish + Dropout(0.1); condition concat; two heads ``linear_means`` /
  ``linear_log_var``. 64x64 input -> 5x5x256 bottleneck.
* ``Decoder`` (vae.py:245-301): Linear(latent -> 6400) + Swish, reshape to
  5x5x256, three ConvTranspose (k=4) 256->128 (s=1,p=0), 128->64, 64->32,
  32->3 (s=2,p=1), BatchNorm+Swish between, **logits output** (the reference
  comments out the final sigmoid, vae.py:278).
* ``VAE`` (vae.py:70-98): encode -> reparametrize -> decode.
* ``MVAE`` (vae.py:101-176): per-modality encoder/decoder pairs (+ optional
  pose MLP 7 <-> [512, 512]), prior expert + PoE fusion.

Departures from the reference, by design (TPU-first):
* Modality-subset evaluation is restructured: encoders run once per modality
  and the 3-/7-subset product-of-experts posteriors are computed via
  ``ops.masked_poe``; decoders are vmapped over the subset axis by the problem
  layer (see problems/reconstruction.py). BatchNorm statistics remain
  per-subset (vmap maps over the subset axis, so batch stats see only one
  subset), preserving the reference's per-pass semantics.
* Reparameterisation noise is threaded through explicit flax RNG streams
  ('reparam', 'dropout') rather than global torch RNG.
* Dropout and BatchNorm always run in training mode — the reference evaluates
  with model.train() (problems.py:174); we replicate that quirk for parity.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from mmdyn_tpu.config import DROPOUT_RATE
from mmdyn_tpu.models.layers import (
    Conv2d,
    ConvTranspose2d,
    Dense,
    Mlp,
    TrainBatchNorm,
    swish,
)
from mmdyn_tpu.ops.poe import prior_expert, product_of_experts, reparametrize


def idx2onehot(idx, n):
    """Integer class ids -> one-hot (vae.py:337-344)."""
    idx = jnp.reshape(idx, (-1,))
    return jax.nn.one_hot(idx, n)


def _concat_condition(x, c, categorical, condition_dim):
    """Concatenate a (possibly categorical) condition (vae.py:231-237)."""
    if c is None:
        return x
    if categorical:
        c = idx2onehot(c, condition_dim)
    elif c.ndim == 1:
        c = c[:, None]
    return jnp.concatenate([x, c.astype(x.dtype)], axis=-1)


class Encoder(nn.Module):
    """CNN or MLP encoder emitting (means, log_vars)."""

    latent_size: int = 8
    architecture: str = "cnn"
    input_dim: int = 784
    layer_sizes: Sequence[int] = (256, 256)
    conditional: bool = False
    categorical_conditions: bool = False
    condition_dim: Optional[int] = None
    dropout_rate: float = DROPOUT_RATE
    compute_dtype: str = "float32"
    bn_mode: str = "batch"   # serving knob; see layers.TrainBatchNorm

    @nn.compact
    def __call__(self, x, c=None):
        dt = self.compute_dtype
        bn = self.bn_mode
        if self.architecture == "cnn":
            x = Conv2d(32, 4, 2, 1, use_bias=False, name="conv_0",
                       compute_dtype=dt)(x)
            x = swish(x)
            x = Conv2d(64, 4, 2, 1, use_bias=False, name="conv_1",
                       compute_dtype=dt)(x)
            x = TrainBatchNorm(name="bn_1", mode=bn)(x)
            x = swish(x)
            x = Conv2d(128, 4, 2, 1, use_bias=False, name="conv_2",
                       compute_dtype=dt)(x)
            x = TrainBatchNorm(name="bn_2", mode=bn)(x)
            x = swish(x)
            x = Conv2d(256, 4, 1, 0, use_bias=False, name="conv_3",
                       compute_dtype=dt)(x)
            x = TrainBatchNorm(name="bn_3", mode=bn)(x)
            x = swish(x)
            x = jnp.reshape(x, (x.shape[0], -1))  # (B, 5*5*256)
            x = Dense(512, name="fc", compute_dtype=dt)(x)
            x = swish(x)
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        else:
            x = jnp.reshape(x, (x.shape[0], -1))
            x = Mlp(self.layer_sizes, activation="relu", name="fc_net",
                    compute_dtype=dt)(x)
            # reference mlp() ends with Identity, then an extra activation-free
            # stack; heads read the last hidden layer (vae.py:218-222)

        if self.conditional:
            x = _concat_condition(x, c, self.categorical_conditions, self.condition_dim)

        means = Dense(self.latent_size, name="linear_means", compute_dtype=dt)(x)
        log_vars = Dense(self.latent_size, name="linear_log_var",
                         compute_dtype=dt)(x)
        # the latent path (PoE fusion, reparam, KL) always runs in f32, even
        # under the bfloat16_full activation policy
        return means.astype(jnp.float32), log_vars.astype(jnp.float32)


class Decoder(nn.Module):
    """CNN or MLP decoder; CNN output is 64x64x3 *logits* (vae.py:278)."""

    latent_size: int = 2
    architecture: str = "cnn"
    output_dim: int = 784
    layer_sizes: Sequence[int] = (256, 256)
    conditional: bool = False
    categorical_conditions: bool = False
    condition_dim: Optional[int] = None
    compute_dtype: str = "float32"
    bn_mode: str = "batch"   # serving knob; see layers.TrainBatchNorm

    @nn.compact
    def __call__(self, z, c=None):
        dt = self.compute_dtype
        bn = self.bn_mode
        if self.conditional:
            z = _concat_condition(z, c, self.categorical_conditions, self.condition_dim)

        if self.architecture == "cnn":
            h = Dense(256 * 5 * 5, name="upsample", compute_dtype=dt)(z)
            h = swish(h)
            h = jnp.reshape(h, (h.shape[0], 5, 5, 256))
            h = ConvTranspose2d(128, 4, 1, 0, use_bias=False, name="deconv_0",
                                compute_dtype=dt)(h)
            h = TrainBatchNorm(name="bn_0", mode=bn)(h)
            h = swish(h)
            h = ConvTranspose2d(64, 4, 2, 1, use_bias=False, name="deconv_1",
                                compute_dtype=dt)(h)
            h = TrainBatchNorm(name="bn_1", mode=bn)(h)
            h = swish(h)
            h = ConvTranspose2d(32, 4, 2, 1, use_bias=False, name="deconv_2",
                                compute_dtype=dt)(h)
            h = TrainBatchNorm(name="bn_2", mode=bn)(h)
            h = swish(h)
            h = ConvTranspose2d(3, 4, 2, 1, use_bias=False, name="deconv_3",
                                compute_dtype=dt)(h)
            # the BCE-with-logits reduction is loss-critical math and runs in
            # f32 — but under bfloat16_full the conv output is already
            # bf16-rounded, so a f32 container here adds bytes, not bits: the
            # loss upcasts elementwise instead (fused into its reduce), and
            # the (K, B, 64, 64, 3) logits + their cotangents stay 2-byte
            if dt == "bfloat16_full":
                return h
            return h.astype(jnp.float32)
        else:
            out = Mlp(tuple(self.layer_sizes) + (self.output_dim,),
                      activation="relu", name="deconv_net",
                      compute_dtype=dt)(z)
            return out.astype(jnp.float32)


class VAE(nn.Module):
    """Vanilla (optionally conditional) VAE (vae.py:70-98)."""

    latent_size: int = 256
    architecture: str = "cnn"
    input_dim: int = 784
    encoder_layer_sizes: Sequence[int] = (256, 256)
    decoder_layer_sizes: Sequence[int] = (256, 256)
    conditional: bool = False
    categorical_conditions: bool = False
    condition_dim: Optional[int] = None
    dropout_rate: float = DROPOUT_RATE
    compute_dtype: str = "float32"
    bn_mode: str = "batch"

    def setup(self):
        self.encoder = Encoder(
            latent_size=self.latent_size,
            architecture=self.architecture,
            input_dim=self.input_dim,
            layer_sizes=self.encoder_layer_sizes,
            conditional=self.conditional,
            categorical_conditions=self.categorical_conditions,
            condition_dim=self.condition_dim,
            dropout_rate=self.dropout_rate,
            compute_dtype=self.compute_dtype,
            bn_mode=self.bn_mode,
        )
        self.decoder = Decoder(
            latent_size=self.latent_size,
            architecture=self.architecture,
            output_dim=self.input_dim,
            layer_sizes=self.decoder_layer_sizes,
            conditional=self.conditional,
            categorical_conditions=self.categorical_conditions,
            condition_dim=self.condition_dim,
            compute_dtype=self.compute_dtype,
            bn_mode=self.bn_mode,
        )

    def __call__(self, x, c=None):
        orig_shape = None
        if x.ndim > 2 and self.architecture == "mlp":
            # replicate vae.py:82-83 view(-1, input_dim): torch folds the
            # NCHW channel planes into the batch axis, so transpose our NHWC
            # input to channel-major before folding, and unfold the
            # reconstruction back to the input layout
            orig_shape = x.shape  # (B, H, W, C)
            x = jnp.reshape(jnp.transpose(x, (0, 3, 1, 2)),
                            (-1, self.input_dim))
        means, log_var = self.encoder(x, c)
        z = reparametrize(self.make_rng("reparam"), means, log_var)
        recon_x = self.decoder(z, c)
        if orig_shape is not None:
            b, h, w, ch = orig_shape
            recon_x = jnp.transpose(jnp.reshape(recon_x, (b, ch, h, w)),
                                    (0, 2, 3, 1))
        return recon_x, means, log_var

    def encode(self, x, c=None):
        return self.encoder(x, c)

    def decode(self, z, c=None):
        return self.decoder(z, c)

    def inference(self, z, c=None):
        """Decode prior samples z ~ N(0, I) (vae.py:90-98)."""
        return self.decoder(z, c)


class MVAE(nn.Module):
    """Multimodal VAE with product-of-experts fusion (vae.py:101-176).

    Modalities: visual (image), tactile (image), optional pose (7-D vector
    through an MLP encoder/decoder with hidden sizes [512, 512],
    vae.py:117-123).
    """

    latent_size: int = 256
    use_pose: bool = False
    conditional: bool = False
    categorical_conditions: bool = False
    condition_dim: Optional[int] = None
    architecture: str = "cnn"
    dropout_rate: float = DROPOUT_RATE
    compute_dtype: str = "float32"
    bn_mode: str = "batch"

    def setup(self):
        assert self.architecture != "mlp", "MVAE is not implemented with MLP"
        img_kwargs = dict(
            latent_size=self.latent_size,
            architecture=self.architecture,
            conditional=self.conditional,
            categorical_conditions=self.categorical_conditions,
            condition_dim=self.condition_dim,
            compute_dtype=self.compute_dtype,
            bn_mode=self.bn_mode,
        )
        self.visual_encoder = Encoder(dropout_rate=self.dropout_rate, **img_kwargs)
        self.visual_decoder = Decoder(**img_kwargs)
        self.tactile_encoder = Encoder(dropout_rate=self.dropout_rate, **img_kwargs)
        self.tactile_decoder = Decoder(**img_kwargs)
        if self.use_pose:
            # pose pathway is unconditional in the reference (condition_dim=0,
            # vae.py:118-123)
            self.pose_encoder = Encoder(
                latent_size=self.latent_size, architecture="mlp",
                input_dim=7, layer_sizes=(512, 512),
                compute_dtype=self.compute_dtype)
            self.pose_decoder = Decoder(
                latent_size=self.latent_size, architecture="mlp",
                output_dim=7, layer_sizes=(512, 512),
                compute_dtype=self.compute_dtype)

    # --- single-modality primitives (used by the subset-vectorised problem
    # layer; each runs encoder BatchNorm/Dropout exactly once per step) ---

    def encode_visual(self, x, c=None):
        return self.visual_encoder(x, c)

    def encode_tactile(self, x, c=None):
        return self.tactile_encoder(x, c)

    def encode_pose(self, pose):
        return self.pose_encoder(pose)

    def decode_visual(self, z, c=None):
        return self.visual_decoder(z, c)

    def decode_tactile(self, z, c=None):
        return self.tactile_decoder(z, c)

    def decode_pose(self, z):
        return self.pose_decoder(z)

    # --- reference-parity joint forward (vae.py:126-165) ---

    def __call__(self, x, pose=None, condition=None):
        visual, tactile = x
        present = [m for m in (visual, tactile, pose) if m is not None]
        batch_size = present[0].shape[0]

        mus = [prior_expert((1, batch_size, self.latent_size))[0]]
        logvars = [prior_expert((1, batch_size, self.latent_size))[1]]
        if visual is not None:
            mu, lv = self.visual_encoder(visual, condition)
            mus.append(mu[None]); logvars.append(lv[None])
        if tactile is not None:
            mu, lv = self.tactile_encoder(tactile, condition)
            mus.append(mu[None]); logvars.append(lv[None])
        if pose is not None and self.use_pose:
            mu, lv = self.pose_encoder(pose)
            mus.append(mu[None]); logvars.append(lv[None])

        mu, log_var = product_of_experts(
            jnp.concatenate(mus, 0), jnp.concatenate(logvars, 0))
        z = reparametrize(self.make_rng("reparam"), mu, log_var)
        visual_recon = self.visual_decoder(z, condition)
        tactile_recon = self.tactile_decoder(z, condition)
        pose_recon = self.pose_decoder(z) if self.use_pose else None
        return visual_recon, tactile_recon, pose_recon, mu, log_var

    def inference(self, z, c=None):
        """Decode prior samples into (visual, tactile) (vae.py:167-176)."""
        return self.visual_decoder(z, c), self.tactile_decoder(z, c)
