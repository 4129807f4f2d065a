"""Fused Pallas kernels for the latent pathway.

``fused_poe_reparam``: for all K modality subsets at once, compute the
product-of-experts posterior (masked precision fusion, reference
vae.py:304-318 semantics including the double epsilon) AND the
reparameterised sample z = pd_mu + noise * exp(0.5 * pd_logvar) in a single
VMEM pass. The masked per-subset reduction over experts is expressed as a
(K, M) x (M, Bt*D) matmul so it rides the MXU.

The backward pass is analytic (derived below) and runs as one fused XLA
computation — Pallas forward, XLA backward is the right split at these sizes.

Falls back to the pure-jnp path off-TPU (the Pallas TPU lowering is
unavailable on CPU; the interpreter is only used in tests).

Gradient derivation (per subset k, expert m, element (b, d); s = 0/1 mask):
    var_m  = exp(lv_m) + eps
    T_m    = s_km / (var_m + eps)
    S      = sum_m T_m                    pd_var = 1/S
    pd_mu  = sum_m mu_m T_m / S           pd_lv  = log(pd_var + eps)
    z      = pd_mu + n * exp(0.5 pd_lv)
backward, given upstream dz, dpd_mu_up, dpd_lv_up:
    dpd_mu = dz + dpd_mu_up
    dpd_lv = 0.5 * dz * n * exp(0.5 pd_lv) + dpd_lv_up
    dS     = -dpd_mu * pd_mu / S - dpd_lv / (S + eps * S^2)
    dT_m   = dpd_mu * mu_m / S + dS
    dmu_m  = sum_k dpd_mu_k * T_mk / S_k
    dlv_m  = sum_k -dT_mk * T_mk / (var_m + eps) * exp(lv_m)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from mmdyn_tpu.config import POE_EPS

# Opt-in for the fused masked-BCE+reduce kernel (measured against plain XLA
# fusion in docs/PARITY.md; see fused_masked_bce_sum below).
FUSED_BCE = os.environ.get("MMDYN_FUSED_BCE", "0") == "1"


def _use_pallas(mu=None):
    """Pallas path only on TPU and only for lane-aligned shapes — Mosaic
    rejects the (M, Bt, D) -> (M, Bt*D) shape cast unless D is a multiple of
    the 128-lane width and the batch tiles align to 8 sublanes."""
    if jax.default_backend() != "tpu":
        return False
    if mu is None:
        return True
    _, b, d = mu.shape
    return d % 128 == 0 and b % 8 == 0


# ---------------------------------------------------------------------------
# reference jnp implementation (also the off-TPU fallback)
# ---------------------------------------------------------------------------

def _poe_reparam_jnp(mu, logvar, mask, noise, eps=POE_EPS):
    """mu/logvar: (M, B, D); mask: (K, M); noise: (K, B, D).

    Returns (z, pd_mu, pd_logvar), each (K, B, D).
    """
    var = jnp.exp(logvar) + eps                    # (M, B, D)
    t = 1.0 / (var + eps)
    m_, b, d = mu.shape
    k = mask.shape[0]
    t_flat = t.reshape(m_, b * d)
    a_flat = (mu * t).reshape(m_, b * d)
    s = (mask @ t_flat).reshape(k, b, d)
    a = (mask @ a_flat).reshape(k, b, d)
    pd_mu = a / s
    pd_var = 1.0 / s
    pd_lv = jnp.log(pd_var + eps)
    z = pd_mu + noise * jnp.exp(0.5 * pd_lv)
    return z, pd_mu, pd_lv


# ---------------------------------------------------------------------------
# pallas forward
# ---------------------------------------------------------------------------

def _poe_kernel(mask_ref, mu_ref, lv_ref, noise_ref, z_ref, pdmu_ref,
                pdlv_ref, *, eps):
    mu = mu_ref[:]                                  # (M, Bt, D)
    lv = lv_ref[:]
    noise = noise_ref[:]                            # (K, Bt, D)
    mask = mask_ref[:]                              # (K, M)

    m_, bt, d = mu.shape
    k = mask.shape[0]
    var = jnp.exp(lv) + eps
    t = 1.0 / (var + eps)
    t_flat = jnp.reshape(t, (m_, bt * d))
    a_flat = jnp.reshape(mu * t, (m_, bt * d))
    s = jnp.dot(mask, t_flat, preferred_element_type=jnp.float32)
    a = jnp.dot(mask, a_flat, preferred_element_type=jnp.float32)
    s = jnp.reshape(s, (k, bt, d))
    a = jnp.reshape(a, (k, bt, d))
    pd_mu = a / s
    pd_lv = jnp.log(1.0 / s + eps)
    pdmu_ref[:] = pd_mu
    pdlv_ref[:] = pd_lv
    z_ref[:] = pd_mu + noise * jnp.exp(0.5 * pd_lv)


def _poe_reparam_pallas(mu, logvar, mask, noise, eps=POE_EPS, block_b=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m_, b, d = mu.shape
    k = mask.shape[0]
    block_b = block_b or min(b, max(1, 2 ** 20 // (d * (2 * m_ + 3 * k) * 4) * 8))
    block_b = min(b, max(8, block_b))
    while b % block_b:
        block_b //= 2
    grid = (b // block_b,)

    out_shape = [jax.ShapeDtypeStruct((k, b, d), jnp.float32)] * 3
    expert_spec = pl.BlockSpec((m_, block_b, d), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)
    subset_spec = pl.BlockSpec((k, block_b, d), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((k, m_), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    z, pd_mu, pd_lv = pl.pallas_call(
        functools.partial(_poe_kernel, eps=eps),
        grid=grid,
        in_specs=[mask_spec, expert_spec, expert_spec, subset_spec],
        out_specs=[subset_spec] * 3,
        out_shape=out_shape,
    )(mask, mu, logvar, noise)
    return z, pd_mu, pd_lv


# ---------------------------------------------------------------------------
# custom vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_poe_reparam(mu, logvar, mask, noise):
    """(M,B,D) experts + (K,M) subset mask + (K,B,D) noise ->
    (z, pd_mu, pd_logvar) each (K,B,D). Pallas on TPU, jnp elsewhere."""
    if _use_pallas(mu):
        return _poe_reparam_pallas(mu, logvar, mask, noise)
    return _poe_reparam_jnp(mu, logvar, mask, noise)


def _fwd(mu, logvar, mask, noise):
    out = fused_poe_reparam(mu, logvar, mask, noise)
    z, pd_mu, pd_lv = out
    return out, (mu, logvar, mask, noise, pd_mu, pd_lv)


def _bwd(res, grads):
    eps = POE_EPS
    mu, logvar, mask, noise, pd_mu, pd_lv = res
    dz, dpdmu_up, dpdlv_up = grads

    var = jnp.exp(logvar) + eps                    # (M, B, D)
    t_all = 1.0 / (var + eps)
    # S per subset: recompute (cheap) — (K, B, D)
    m_, b, d = mu.shape
    k = mask.shape[0]
    s = (mask @ t_all.reshape(m_, b * d)).reshape(k, b, d)

    dpd_mu = dz + dpdmu_up
    dpd_lv = 0.5 * dz * noise * jnp.exp(0.5 * pd_lv) + dpdlv_up

    ds = -dpd_mu * pd_mu / s - dpd_lv / (s + eps * jnp.square(s))
    # dT_{km} = dpd_mu_k * mu_m / S_k + dS_k ; contract over k with mask
    # dmu_m = sum_k mask_km * dpd_mu_k * T_m / S_k
    w = (dpd_mu / s).reshape(k, b * d)             # (K, B*D)
    dmu = (mask.T @ w).reshape(m_, b, d) * t_all
    # dT contribution to logvar:
    #   dT_km = mask_km * (dpd_mu_k * mu_m / S_k + dS_k)
    #   dlv_m = sum_k dT_km * (-T_m / (var_m + eps)) * exp(lv_m)
    ds_flat = ds.reshape(k, b * d)
    sum_ds = (mask.T @ ds_flat).reshape(m_, b, d)        # sum_k mask*dS
    sum_w = (mask.T @ w).reshape(m_, b, d)               # sum_k mask*dpd_mu/S
    dT = sum_w * mu + sum_ds
    dlv = dT * (-t_all / (var + eps)) * jnp.exp(logvar)
    return dmu, dlv, None, None


fused_poe_reparam.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# fused masked BCE-with-logits + sum reduction
# ---------------------------------------------------------------------------
#
# loss = sum_{k,b,p} max(x,0) - x*z + log1p(exp(-|x|)),
#   with x = logits_{kbp} * m_{bp},  z = target_{bp} * m_{bp}  (mask optional)
#
# The jnp path broadcasts the target over the K subset axis and lets XLA fuse
# (reference loss: problems.py:421-458). The Pallas path streams (K, Bb, P)
# logit tiles through VMEM, applying broadcast+mask+BCE+partial-reduce in one
# pass — one partial sum per grid block, summed outside. Backward is analytic:
#   dlogits = g * m * (sigmoid(x) - z)        (targets/mask are data)


def _bce_jnp(logits, target, mask):
    # The naive form broadcasts the (B, ...) target over the K subset axis —
    # XLA materialises that broadcast (plus layout copies) at dyn_modeling
    # sizes. Split sum_k BCE(x_k, z) into a target-free part and a single
    # z * (sum_k x_k) contraction instead: the target is read once, never
    # broadcast, and both reductions share one fused pass over the logits.
    # The f32 upcast happens here (fused into the reduce) so bf16 logits are
    # never widened in HBM; reduction math is f32 throughout.
    x = logits.astype(jnp.float32)
    if mask is not None:
        x = x * mask[None]
    target_free = jnp.sum(jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x))))
    z = target if mask is None else target * mask
    return target_free - jnp.sum(z * jnp.sum(x, axis=0))


def _bce_kernel(logits_ref, target_ref, mask_ref, out_ref):
    from jax.experimental import pallas as pl

    x = logits_ref[:]                               # (K, Bb, P)
    z = target_ref[:][None]                         # (1, Bb, P)
    if mask_ref is not None:
        m = mask_ref[:][None]
        x = x * m
        z = z * m
    loss = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))

    # TPU grid steps run sequentially: accumulate into the single (1, 1)
    # output block (initialised on the first step)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += jnp.sum(loss)


def _bce_kernel_nomask(logits_ref, target_ref, out_ref):
    _bce_kernel(logits_ref, target_ref, None, out_ref)


def _bce_pallas(logits, target, mask):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, b, p = logits.shape
    # VMEM budget: the logits block plus x/z/loss intermediates are each
    # (K, block_b, P) floats (~4K arrays) + 2 row blocks; stay under the 16 MB
    # scoped-vmem limit with headroom. Use the largest power-of-two block that
    # divides b (Mosaic needs the sublane dim divisible by 8, and
    # power-of-two blocks always halve into a divisor).
    budget_b = max(8, 2 ** 21 // ((4 * k + 3) * p))
    block_b = 8
    while block_b * 2 <= min(b, budget_b):
        block_b *= 2
    while b % block_b:
        block_b //= 2
    grid = (b // block_b,)

    logits_spec = pl.BlockSpec((k, block_b, p), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((block_b, p), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((1, 1), jnp.float32)
    if mask is None:
        total = pl.pallas_call(
            _bce_kernel_nomask, grid=grid,
            in_specs=[logits_spec, row_spec], out_specs=out_spec,
            out_shape=out_shape)(logits, target)
    else:
        total = pl.pallas_call(
            _bce_kernel, grid=grid,
            in_specs=[logits_spec, row_spec, row_spec], out_specs=out_spec,
            out_shape=out_shape)(logits, target, mask)
    return total[0, 0]


def _bce_lane_ok(logits):
    k, b, p = logits.shape
    return p % 128 == 0 and b % 8 == 0


@jax.custom_vjp
def fused_masked_bce_sum(logits, target, mask):
    """Sum-reduced BCE-with-logits of (K, B, ...) logits vs a shared (B, ...)
    target, optionally masked by a (B, ...) ``mask`` (multiplying both sides,
    problems.py:409-411 semantics). Trailing dims are arbitrary — image
    losses pass native (K, B, H, W, C) tensors so no layout-changing flatten
    is ever materialised. Pallas on TPU for lane-aligned shapes when
    MMDYN_FUSED_BCE=1; XLA-fused jnp otherwise. bf16 logits are upcast
    elementwise inside the fused reduction (f32 math, 2-byte traffic)."""
    if FUSED_BCE and jax.default_backend() == "tpu":
        k, b = logits.shape[:2]
        flat = (jnp.reshape(logits, (k, b, -1)).astype(jnp.float32),
                jnp.reshape(target, (b, -1)),
                None if mask is None else jnp.reshape(mask, (b, -1)))
        if _bce_lane_ok(flat[0]):
            return _bce_pallas(*flat)
    return _bce_jnp(logits, target, mask)


def _bce_fwd(logits, target, mask):
    return fused_masked_bce_sum(logits, target, mask), (logits, target, mask)


def _bce_bwd(res, g):
    logits, target, mask = res
    x = logits.astype(jnp.float32)
    if mask is None:
        z = target[None]
    else:
        x = x * mask[None]
        z = (target * mask)[None]
    d = g * (jax.nn.sigmoid(x) - z)
    if mask is not None:
        d = d * mask[None]
    # the cotangent re-enters the decoder backward in the logits dtype (bf16
    # under bfloat16_full — identical rounding to the old f32-container path,
    # where the astype-VJP performed this exact cast)
    return d.astype(logits.dtype), None, None


fused_masked_bce_sum.defvjp(_bce_fwd, _bce_bwd)
