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
