"""Device->host wire packing: run-length encoding ON the accelerator.

The tunnel between this host and the TPU is link-capped at ~28-31 MB/s
(measured; concurrent device_get streams do NOT add up), so raw uint8 frame
payloads (~2.4 MB per 640x480 snapshot) bound data generation at ~11
frames/s no matter how fast the device renders. The rendered frames are
extremely run-length-friendly (flat backgrounds, clipped depth, masked
segmentation), so the wire format is RLE computed on device:

    vals[r]   — the run's value (uint32: a packed 24-bit RGB pixel or a byte)
    starts[r] — the flat index where run r begins

Host-side decode is ``np.repeat(vals, diff(starts))`` — exact, branch-free,
and ~100x faster than the link. A whole chunk of frames (and all four
payload streams of a snapshot) is encoded as ONE stream with forced run
breaks at every frame boundary, so one transfer needs exactly one scalar
readback (the run count) plus one bucket-padded array download.

Pathological inputs (noise) are guarded: the caller sees the encoded size
before downloading and falls back to the raw transfer when RLE would lose
(``RunLengthWire.get``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def pack_rgb(img):
    """(..., H, W, 3) uint8 -> (..., H*W) uint32 pixel stream (r|g<<8|b<<16)."""
    u = img.astype(jnp.uint32)
    pix = u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16)
    return pix.reshape(*img.shape[:-3], -1)


def unpack_rgb(pix, h, w):
    """Inverse of pack_rgb (host numpy)."""
    pix = np.asarray(pix, np.uint32)
    out = np.empty(pix.shape + (3,), np.uint8)
    out[..., 0] = pix & 0xFF
    out[..., 1] = (pix >> 8) & 0xFF
    out[..., 2] = (pix >> 16) & 0xFF
    return out.reshape(*pix.shape[:-1], h, w, 3)


def _encode(flat, row_len):
    """RLE of a (M,) uint32 stream with forced breaks every ``row_len``
    elements. Returns (vals (M,) u32, starts (M,) i32, n_runs scalar) —
    only the first n_runs entries of vals/starts are meaningful."""
    m = flat.shape[0]
    idx = lax.iota(jnp.int32, m)
    prev = jnp.concatenate([flat[:1], flat[:-1]])
    b = (flat != prev) | ((idx % row_len) == 0)
    rid = jnp.cumsum(b.astype(jnp.int32)) - 1
    n_runs = rid[-1] + 1
    # duplicate scatter writes within a run all carry the same value
    vals = jnp.zeros(m, jnp.uint32).at[rid].set(flat)
    starts = jnp.full(m, m, jnp.int32).at[rid].min(idx)
    return vals, starts, n_runs


class RunLengthWire:
    """Compiled encode + bucket-sliced download of frame streams."""

    def __init__(self):
        self._encode = jax.jit(_encode, static_argnames=("row_len",))
        self._slice = jax.jit(
            lambda v, s, n: (lax.dynamic_slice(v, (0,), (n,)),
                             lax.dynamic_slice(s, (0,), (n,))),
            static_argnames=("n",))

    def encode(self, streams, row_len):
        """Encode a list of (F, row_len) uint32 device arrays as one stream.

        Returns an opaque handle for :meth:`get`. All compute stays on
        device; nothing is downloaded yet.
        """
        flat = jnp.concatenate([s.reshape(-1) for s in streams])
        vals, starts, n_runs = self._encode(flat, row_len=int(row_len))
        shapes = [tuple(s.shape) for s in streams]
        return {"vals": vals, "starts": starts, "n_runs": n_runs,
                "shapes": shapes, "row_len": int(row_len),
                "streams": streams}

    def get(self, handle):
        """Download + decode the handle's streams -> list of host uint32
        arrays with the original (F, row_len) shapes.

        One scalar readback (the run count), then one bucket-padded array
        download; falls back to the raw transfer when RLE would move more
        bytes than the original stream.
        """
        m = sum(int(np.prod(s)) for s in handle["shapes"])
        n_runs = int(jax.device_get(handle["n_runs"]))
        bucket = 1
        while bucket < n_runs:
            bucket *= 2
        bucket = min(bucket, m)
        if bucket * 8 >= m * 4:
            # pathological stream: raw is smaller — ship it directly
            parts = jax.device_get(tuple(handle["streams"]))
            return [np.asarray(p, np.uint32) for p in parts]
        v, s = jax.device_get(self._slice(handle["vals"], handle["starts"],
                                          n=bucket))
        v, s = v[:n_runs], np.asarray(s[:n_runs], np.int64)
        lengths = np.diff(np.append(s, m))
        flat = np.repeat(v, lengths)
        out, off = [], 0
        for shape in handle["shapes"]:
            k = int(np.prod(shape))
            out.append(flat[off:off + k].reshape(shape))
            off += k
        return out
