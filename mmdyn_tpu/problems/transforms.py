"""Jittable sequence-batch transforms.

The reference flattens each batch of B sequences of length T into (B*T, ...)
via seq_collate_fn (mmdyn/pytorch/utils/datasets.py:395-404) and then:

* seq_modeling strides ``[::T]`` (problems.py:648-655) — i.e. selects frame 0
  of every sequence;
* dyn_modeling targets are ``torch.roll(x, -1, dims=0)`` over the flattened
  axis with every sequence's last step patched to the resting frame
  (problems.py:775-788).

Here batches arrive as (B, T, ...) and the transforms are expressed as static
reshapes/rolls the compiler can fuse; the flattened forms are numerically
identical to the reference's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flatten_seq(x):
    """(B, T, ...) -> (B*T, ...), the seq_collate_fn layout."""
    return jnp.reshape(x, (-1,) + x.shape[2:])


def stride_first(x):
    """(B, T, ...) -> (B, ...): frame 0 of each sequence.

    Equivalent to ``flat[::T]`` on the collated batch (problems.py:648).
    """
    return x[:, 0]


def dyn_roll(x):
    """(B, T, ...) -> (B*T, ...) one-step-shifted over the flattened axis.

    Matches ``torch.roll(flat, -1, dims=0)`` exactly, including the wrap
    across sequence boundaries and the batch end (problems.py:777).
    """
    flat = flatten_seq(x)
    return jnp.roll(flat, -1, axis=0)


def _geom_one(img, flip, dy, dx, pad):
    """Flip + integer-shift one (H, W, C) frame; edge padding, static sizes."""
    img = jnp.where(flip, img[:, ::-1, :], img)
    padded = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    return jax.lax.dynamic_slice(padded, (pad + dy, pad + dx, 0), img.shape)


def augment_batch(batch, key, max_shift: int = 4, brightness: float = 0.1):
    """On-device train-time augmentation (capability beyond the reference).

    Per *sequence*: a horizontal flip (p=0.5), an integer translation of up to
    ``max_shift`` pixels (edge-padded), and a brightness scale in
    ``1 ± brightness``. The same geometric transform is applied to every frame
    of the sequence, its resting-frame target, and its segmentation mask, so
    the dynamics targets stay physically coherent (the scene physics is
    mirror/translation symmetric about the sensor plane). Brightness touches
    the photometric modalities only (visual/tactile + finals), never ``seg``.

    Everything is expressed as static-shape XLA ops (where / pad /
    dynamic_slice under vmap), so it fuses into the train step — no host-side
    PIL/torchvision pass exists in this framework.
    """
    imgs = [k for k in ("visual", "tactile") if batch.get(k) is not None]
    if not imgs:
        return batch
    b = batch[imgs[0]].shape[0]
    kf, ky, kx, kb = jax.random.split(key, 4)
    flip = jax.random.bernoulli(kf, 0.5, (b,))
    dy = jax.random.randint(ky, (b,), -max_shift, max_shift + 1)
    dx = jax.random.randint(kx, (b,), -max_shift, max_shift + 1)
    scale = 1.0 + jax.random.uniform(kb, (b,), minval=-brightness,
                                     maxval=brightness)

    geom_frame = lambda img, f, y, x: _geom_one(img, f, y, x, max_shift)
    geom_seq = jax.vmap(jax.vmap(geom_frame, in_axes=(0, None, None, None)))
    geom_final = jax.vmap(geom_frame)

    out = dict(batch)
    for k in imgs:
        seq = geom_seq(batch[k], flip, dy, dx)
        out[k] = jnp.clip(seq * scale[:, None, None, None, None], 0.0, 1.0)
        fk = f"final_{k}"
        if batch.get(fk) is not None:
            fin = geom_final(batch[fk], flip, dy, dx)
            out[fk] = jnp.clip(fin * scale[:, None, None, None], 0.0, 1.0)
    if batch.get("seg") is not None:
        out["seg"] = geom_seq(batch["seg"], flip, dy, dx)
    return out


def dyn_targets(x, final):
    """One-step dynamics image targets (problems.py:775-788).

    target = roll(flat, -1) with each sequence's last frame patched to the
    sequence's resting frame ``final``.

    Args:
        x:     (B, T, ...) input frames.
        final: (B, ...) resting frames.
    """
    b, t = x.shape[0], x.shape[1]
    rolled = jnp.reshape(dyn_roll(x), (b, t) + x.shape[2:])
    target = rolled.at[:, t - 1].set(final)
    return jnp.reshape(target, (-1,) + x.shape[2:])
