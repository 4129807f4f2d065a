"""Building-block layers (flax.linen), NHWC layout for TPU.

Numerical parity notes vs the reference (mmdyn/pytorch/models/vae.py):

* ``Swish`` — x * sigmoid(x) (vae.py:331-334).
* ``TrainBatchNorm`` — the reference runs BatchNorm in *training mode even
  during evaluation* (problems.py:174 calls model.train() in _test_epoch), so
  running statistics are never consulted. We therefore normalise by the
  current batch statistics always (biased variance, eps=1e-5 = torch default)
  and carry no running-stats state at all. This both matches the reference
  semantics exactly and keeps the train step a pure function of (params,
  batch, rng) — ideal under jit.
* ``ConvTranspose2d`` — implements torch ConvTranspose2d(kernel, stride,
  padding) semantics via lax.conv_general_dilated with lhs_dilation=stride and
  spatial padding (kernel - 1 - padding). Output size = (in-1)*s - 2p + k,
  matching vae.py:268-277. The kernel is stored in (kh, kw, in, out) "already
  correlated" orientation; to import torch weights use
  ``kernel[h, w, i, o] = torch_w[i, o, kh-1-h, kw-1-w]``.
* Initialisers mimic torch defaults: kaiming_uniform(a=sqrt(5)) for weights
  (bound = 1/sqrt(fan_in)) and uniform(+-1/sqrt(fan_in)) for biases, so the
  init distribution (and thus training trajectory statistics) match.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from mmdyn_tpu.config import BN_EPS

# torch kaiming_uniform(a=sqrt(5)): bound = sqrt(3 * (1/3) / fan_in) = 1/sqrt(fan_in)
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in):
    """torch Linear/Conv bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def swish(x):
    """x * sigmoid(x) (vae.py:331-334)."""
    return x * jax.nn.sigmoid(x)


class Swish(nn.Module):
    @nn.compact
    def __call__(self, x):
        return swish(x)


class TrainBatchNorm(nn.Module):
    """BatchNorm that always uses current-batch statistics (see module doc)."""

    eps: float = BN_EPS

    @nn.compact
    def __call__(self, x):
        # normalise over all axes but the channel axis (last); statistics
        # always accumulate in f32 (bfloat16_full activations would lose the
        # variance to squaring error otherwise)
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)  # biased
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        inv = jax.lax.rsqrt(var + self.eps)
        # the normalisation itself reads/writes the activation dtype: under
        # bfloat16_full the (x - mean) * inv fusion moves 2-byte tensors
        return ((x - mean.astype(x.dtype)) * inv.astype(x.dtype)
                * scale.astype(x.dtype) + bias.astype(x.dtype))


def _cast_compute(x, kernel, compute_dtype):
    """Cast conv/matmul operands to the compute dtype (bfloat16 feeds the MXU
    at full rate; the MXU accumulates in float32 internally). Mixed-dtype
    operands break the conv transpose (grad) rule, so both operands and the
    output share the compute dtype; callers upcast the result via
    ``_uncast``."""
    if compute_dtype is None or compute_dtype == "float32":
        return x, kernel
    dt = jnp.bfloat16 if str(compute_dtype).startswith("bfloat16") else \
        jnp.dtype(compute_dtype)
    return x.astype(dt), kernel.astype(dt)


def _uncast(y, compute_dtype="float32"):
    """Dtype of the tensor written at the layer boundary.

    * ``float32`` / ``bfloat16``: upcast to float32 — the elementwise path
      (bias/BN/swish) and the backward residuals live in f32.
    * ``bfloat16_full``: keep bfloat16 — activations stay 2-byte end to end,
      halving the HBM traffic of this bandwidth-bound workload (the DCGAN
      step's arithmetic intensity is ~56 flop/byte vs the ~240 a v5e needs to
      be compute-bound — see docs/PARITY.md roofline). Reductions (BatchNorm
      statistics) and the latent/loss math still accumulate in f32.
    """
    if compute_dtype == "bfloat16_full":
        return y
    return y.astype(jnp.float32) if y.dtype != jnp.float32 else y


class Conv2d(nn.Module):
    """Conv with torch-style explicit (stride, padding) ints, NHWC/HWIO."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", torch_kernel_init, (k, k, in_ch, self.features), jnp.float32
        )
        xc, kc = _cast_compute(x, kernel, self.compute_dtype)
        y = jax.lax.conv_general_dilated(
            xc,
            kc,
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = _uncast(y, self.compute_dtype)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_ch * k * k), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose2d(nn.Module):
    """torch-semantics transposed conv (see module docstring)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        pad = k - 1 - self.padding
        # torch's kaiming_uniform on a ConvTranspose2d weight (in, out, kh,
        # kw) computes fan_in from dim 1 = out_ch*k*k, i.e. our fan_OUT
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_out", "uniform"),
            (k, k, in_ch, self.features), jnp.float32
        )
        xc, kc = _cast_compute(x, kernel, self.compute_dtype)
        y = jax.lax.conv_general_dilated(
            xc,
            kc,
            window_strides=(1, 1),
            padding=[(pad, pad)] * 2,
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = _uncast(y, self.compute_dtype)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(self.features * k * k), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Dense(nn.Module):
    """Linear layer with torch default init."""

    features: int
    use_bias: bool = True
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (in_dim, self.features),
                            jnp.float32)
        xc, kc = _cast_compute(x, kernel, self.compute_dtype)
        y = _uncast(jnp.dot(xc, kc, preferred_element_type=jnp.float32)
                    if self.compute_dtype == "float32"
                    else jnp.dot(xc, kc), self.compute_dtype)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_dim), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Mlp(nn.Module):
    """MLP stack matching the reference ``mlp()`` helper (vae.py:14-19):
    Linear->act for all but the last layer, identity on the output."""

    sizes: Sequence[int]          # hidden + output sizes (input inferred)
    activation: str = "relu"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        act = {"relu": jax.nn.relu, "swish": swish}[self.activation]
        for j, size in enumerate(self.sizes):
            x = Dense(size, name=f"linear_{j}",
                      compute_dtype=self.compute_dtype)(x)
            if j < len(self.sizes) - 1:
                x = act(x)
        return x
