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


def _train_bn_fwd_math(x, scale, bias, eps):
    """Forward of always-train-mode BN: batch statistics in f32, the
    normalisation itself in the activation dtype (under bfloat16_full the
    (x - mean) * inv fusion moves 2-byte tensors)."""
    axes = tuple(range(x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)  # biased
    inv = jax.lax.rsqrt(var + eps)
    y = ((x - mean.astype(x.dtype)) * inv.astype(x.dtype)
         * scale.astype(x.dtype) + bias.astype(x.dtype))
    return y, mean, inv


from functools import partial as _bn_partial


@_bn_partial(jax.custom_vjp, nondiff_argnums=(3,))
def _train_bn_manual(x, scale, bias, eps):
    """Train-mode BN with the textbook two-pass backward.

    XLA's autodiff of the mean/var graph above emits its gradient as chained
    sub-gradients (d var -> d mean -> d x); the closed form

        dx = g * inv / N * (N*ct - sum(ct) - xhat * sum(ct * xhat))

    needs exactly two fused passes over (ct, x): one for the three channel
    reductions (which also yield d_scale/d_bias) and one elementwise pass
    for dx. A/B-measured on v5e (docs/PARITY.md "BN statistics traffic"):
    3.5-8% faster on the seq@512 flagship in two same-session pairings, a
    wash at dyn 256x8 — the DEFAULT. ``MMDYN_BN_VJP=autodiff`` restores
    XLA autodiff of the statistics graph.
    """
    y, _, _ = _train_bn_fwd_math(x, scale, bias, eps)
    return y


def _train_bn_manual_fwd(x, scale, bias, eps):
    y, mean, inv = _train_bn_fwd_math(x, scale, bias, eps)
    return y, (x, scale, mean, inv)


def _train_bn_manual_bwd(eps, res, ct):
    x, scale, mean, inv = res
    axes = tuple(range(x.ndim - 1))
    n = 1
    for a in axes:
        n *= x.shape[a]
    ctf = ct.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * inv
    sum_ct = jnp.sum(ctf, axis=axes)
    sum_ct_xhat = jnp.sum(ctf * xhat, axis=axes)
    g_inv = (scale.astype(jnp.float32) * inv) / n
    dx = g_inv * (n * ctf - sum_ct - xhat * sum_ct_xhat)
    return dx.astype(x.dtype), sum_ct_xhat, sum_ct


_train_bn_manual.defvjp(_train_bn_manual_fwd, _train_bn_manual_bwd)


class TrainBatchNorm(nn.Module):
    """BatchNorm that always uses current-batch statistics (see module doc).

    ``MMDYN_BN_VJP``: ``manual`` forces the hand-derived two-pass backward,
    ``autodiff`` forces XLA autodiff of the statistics graph, ``auto``
    (default) picks manual — identical math either way (same closed form,
    f32 accumulation; only the reduction scheduling differs).
    ``MMDYN_BN_NOSTATS=1`` is a PERF-ONLY ablation (wrong numerics!) that
    replaces the statistics with constants, bounding from above what any
    stats-fusion kernel could save (docs/PARITY.md).
    ``MMDYN_BN_STOPGRAD_STATS=1`` is a PERF-ONLY ablation (bit-exact
    forward, wrong input gradients) that stop-gradients the batch
    statistics, isolating the backward stat-term share of that bound —
    measured to be ALL of it (docs/PARITY.md "BN statistics traffic").

    ``mode`` (serving-side knob; training always uses the default):
      * ``"batch"``   — current-batch statistics (reference semantics).
      * ``"collect"`` — batch statistics, additionally written to a
        ``bn_stats`` variable collection (apply with
        ``mutable=["bn_stats"]``) so a calibration pass can capture them.
      * ``"frozen"``  — normalise with statistics read from ``bn_stats``:
        per-example deterministic, batch-composition independent (and
        reduction-free — cheaper than batch mode). Used by
        ``serve.InferenceSession.freeze_bn``.
    """

    eps: float = BN_EPS
    mode: str = "batch"

    @nn.compact
    def __call__(self, x):
        import os

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.mode == "frozen":
            mean = self.variable("bn_stats", "mean",
                                 lambda: jnp.zeros((c,), jnp.float32)).value
            var = self.variable("bn_stats", "var",
                                lambda: jnp.ones((c,), jnp.float32)).value
            inv = jax.lax.rsqrt(var + self.eps)
            return ((x - mean.astype(x.dtype)) * inv.astype(x.dtype)
                    * scale.astype(x.dtype) + bias.astype(x.dtype))
        if self.mode == "collect":
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            mv = self.variable("bn_stats", "mean",
                               lambda: jnp.zeros((c,), jnp.float32))
            vv = self.variable("bn_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
            if not self.is_initializing():
                mv.value, vv.value = mean, var
            inv = jax.lax.rsqrt(var + self.eps)
            return ((x - mean.astype(x.dtype)) * inv.astype(x.dtype)
                    * scale.astype(x.dtype) + bias.astype(x.dtype))
        if os.environ.get("MMDYN_BN_NOSTATS") == "1":
            inv = jax.lax.rsqrt(jnp.ones((c,), jnp.float32) + self.eps)
            return (x * inv.astype(x.dtype) * scale.astype(x.dtype)
                    + bias.astype(x.dtype))
        if os.environ.get("MMDYN_BN_STOPGRAD_STATS") == "1":
            # PERF ABLATION (wrong gradients, right forward): treat the batch
            # statistics as constants under autodiff. Removes exactly the
            # backward's stat-gradient terms while keeping the forward stats
            # reductions — splitting the MMDYN_BN_NOSTATS bound into its
            # forward-read and backward-term components (docs/PARITY.md
            # "BN statistics traffic").
            y, mean, inv = _train_bn_fwd_math(x, scale, bias, self.eps)
            del y
            mean = jax.lax.stop_gradient(mean)
            inv = jax.lax.stop_gradient(inv)
            return ((x - mean.astype(x.dtype)) * inv.astype(x.dtype)
                    * scale.astype(x.dtype) + bias.astype(x.dtype))
        mode = os.environ.get("MMDYN_BN_VJP", "auto")
        if mode in ("auto", "manual"):
            return _train_bn_manual(x, scale, bias, self.eps)
        y, _, _ = _train_bn_fwd_math(x, scale, bias, self.eps)
        return y


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
    """torch-semantics transposed conv (see module docstring).

    ``MMDYN_DECONV=subpixel`` switches the (k=4, s=2, p=1) configuration —
    every strided deconv in the DCGAN decoder (reference vae.py:268-277) —
    to an exact sub-pixel decomposition instead of ``lhs_dilation``: one
    dense 2x2 conv emitting the four output phases, then a pixel-shuffle
    interleave (see ``_deconv_k4s2p1_subpixel``). Measured on v5e (2026-08,
    docs/PARITY.md): the dilated lowering WINS decisively — subpixel's
    phase interleave materialises extra copies in awful small-channel
    layouts (dyn step 89 -> 203 ms, seq 21 -> 38 ms) — so dilated stays the
    default and the subpixel path is kept as measured evidence and as a
    fallback should XLA's input-dilation handling regress.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        import os

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
        mode = os.environ.get("MMDYN_DECONV", "dilated")
        subpixel = (k == 4 and self.stride == 2 and self.padding == 1
                    and mode == "subpixel")
        if subpixel:
            y = _deconv_k4s2p1_subpixel(xc, kc, self.features)
        elif mode == "stridedgrad":
            y = _deconv_stridedgrad(xc, kc, self.stride, self.padding)
        else:
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


from functools import partial as _partial


def _deconv_impl(x, kernel, stride, padding):
    """The dilated-lhs forward shared by the default and stridedgrad paths."""
    k = kernel.shape[0]
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(pad, pad)] * 2,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@_partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _deconv_stridedgrad(x, kernel, stride, padding):
    """ConvTranspose2d forward with a hand-derived backward.

    XLA's automatic transpose of the ``lhs_dilation`` conv emits spatial
    ``reverse`` ops + relayout copies on the ACTIVATION tensors (the 2.28
    GB/step residual in the dyn_modeling HLO byte census, docs/PARITY.md).
    Both gradients have reverse-free formulations:

    * grad_x: y[m] = sum_u K[u] xd[m+u-(k-1-p)] with xd the s-dilated input
      gives grad_x[j] = sum_{u'} K[k-1-u'] ct[s*j - p + u'] — a plain
      stride-s correlation of the cotangent with the spatially-FLIPPED,
      io-transposed kernel, symmetric padding p. The flip lands on the
      (k, k, I, O) kernel — bytes-free — never on the activations.
    * grad_K[u] = sum_{b,j} x[b,j] ct[b, s*j + (k-1-p) - u] — a conv with
      batch as the contracted feature: lhs = x^T (I,H,W,B) with
      lhs_dilation=s, rhs = ct^T (M,M,B,O), symmetric padding k-1-p.

    Gated behind ``MMDYN_DECONV=stridedgrad``; A/B-measured on v5e and
    REJECTED as the default (~6% slower on both flagship configs — XLA's
    fused transpose pipeline beats this algebraically-cleaner formulation);
    kept as measured evidence. See docs/PARITY.md "dyn_modeling optimisation
    campaign".
    """
    return _deconv_impl(x, kernel, stride, padding)


def _deconv_sg_fwd(x, kernel, stride, padding):
    return _deconv_impl(x, kernel, stride, padding), (x, kernel)


def _deconv_sg_bwd(stride, padding, res, ct):
    x, kernel = res
    k = kernel.shape[0]
    kg = jnp.transpose(jnp.flip(kernel, (0, 1)), (0, 1, 3, 2))
    gx = jax.lax.conv_general_dilated(
        ct, kg, window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    c = k - 1 - padding
    xl = jnp.transpose(x, (3, 1, 2, 0))      # (I, H, W, B)
    yr = jnp.transpose(ct, (1, 2, 0, 3))     # (M, M, B, O)
    gk = jax.lax.conv_general_dilated(
        xl, yr, window_strides=(1, 1), padding=[(c, c)] * 2,
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    gk = jnp.transpose(gk, (1, 2, 0, 3))     # (I, k, k, O) -> (k, k, I, O)
    return gx, gk.astype(kernel.dtype)


_deconv_stridedgrad.defvjp(_deconv_sg_fwd, _deconv_sg_bwd)


def _deconv_k4s2p1_subpixel(x, kernel, c_out):
    """Exact sub-pixel lowering of ConvTranspose2d(k=4, s=2, p=1).

    With input dilation 2 and spatial pad 2, output row m draws on kernel
    taps of matching parity only:
        y[2i]   = x[i-1] @ K[0] + x[i]   @ K[2]
        y[2i+1] = x[i]   @ K[1] + x[i+1] @ K[3]
    (per spatial dim; K in stored correlation orientation). Phase (di, dj)
    is therefore a dense 2x2 conv with kernel K[2u+di, 2v+dj] over x padded
    by 1, windows offset by the phase. One conv emits all four phases as
    channel groups; a slice+stack interleave (fused by XLA) rebuilds the
    (2H, 2W) output. Bit-identical sums to the dilated form modulo conv
    accumulation order (the elided taps are exact zeros).
    """
    b, h, w, c_in = x.shape
    # K[2u+di, 2v+dj, i, o] -> [u, di, v, dj, i, o] -> (u, v, i, (di, dj, o))
    kp = jnp.reshape(kernel, (2, 2, 2, 2, c_in, c_out))
    kp = jnp.transpose(kp, (0, 2, 4, 1, 3, 5))
    kp = jnp.reshape(kp, (2, 2, c_in, 4 * c_out))
    co = jax.lax.conv_general_dilated(
        x, kp, window_strides=(1, 1), padding=[(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )                                           # (B, H+1, W+1, 4*C)
    co = jnp.reshape(co, (b, h + 1, w + 1, 2, 2, c_out))
    # t[b, i, di, j, dj, c] = co[b, i+di, j+dj, di, dj, c]
    t = jnp.stack(
        [jnp.stack([co[:, di:di + h, dj:dj + w, di, dj, :] for dj in (0, 1)],
                   axis=3) for di in (0, 1)],
        axis=2)                                  # (B, H, 2, W, 2, C)
    return jnp.reshape(t, (b, 2 * h, 2 * w, c_out))


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
