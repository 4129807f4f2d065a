"""Device->host wire packing: run-length encoding ON the accelerator.

The tunnel between this host and the TPU is link-capped at ~28-31 MB/s
(measured; concurrent device_get streams do NOT add up), so raw uint8 frame
payloads (~2.4 MB per 640x480 snapshot) bound data generation at ~11
frames/s no matter how fast the device renders. The rendered frames are
extremely run-length-friendly (flat backgrounds, clipped depth, masked
segmentation), so the wire format is RLE computed on device:

    v0/v1/v2[r] — the run value's three byte planes (a packed 24-bit RGB
                  pixel or a byte value)
    lengths[r]  — the run length as uint16 (forced breaks every ``row_len``
                  elements bound every run below 2^16)

5 bytes per run on the wire. Host-side decode is ``np.repeat(vals,
lengths)`` — exact, branch-free, and ~100x faster than the link. A whole
chunk of frames (and all four payload streams of a snapshot) is encoded as
ONE stream, so one transfer needs exactly one scalar readback (the run
count) plus one bucket-padded download.

Pathological inputs (noise) are guarded: the caller sees the encoded size
before downloading and falls back to the raw transfer when RLE would lose
(``RunLengthWire.get``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _bucket(n):
    """Smallest {1, 1.125, ..., 1.875} x 2^k >= n: <= 6.7% download padding
    with ~8x more compiled slice programs than pow2 buckets (each is a
    trivial dynamic-slice; pow2 padding wasted up to 2x the transfer)."""
    if n <= 4096:
        return 4096
    p = 1 << (int(n - 1).bit_length() - 1)  # largest pow2 <= n-1... floor
    step = p // 8
    return ((n + step - 1) // step) * step


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


def _encode(flat, row_len, planes):
    """RLE of a (M,) uint32 stream with forced breaks every ``row_len``
    elements. Returns ``planes``+2 bytes per run on the wire — ``planes``
    value byte-planes + a uint16 length (row breaks cap every run below
    2^16) — plus the run count; only the first n_runs entries of each
    array are meaningful. The run-start compaction dominates the encode
    cost, which is why callers FOLD streams into unused value bytes:
    fewer elements beat fewer wire bytes. It lowers as ONE XLA sort of m
    keys — measured 331M elem/s on TPU vs 107M for the round-4
    scatter-min and 5M for searchsorted-over-cumsum (tools/bench_wire.py,
    all three bit-exact on the same contract)."""
    m = flat.shape[0]
    idx = lax.iota(jnp.int32, m)
    prev = jnp.concatenate([flat[:1], flat[:-1]])
    b = (flat != prev) | ((idx % row_len) == 0)
    n_runs = jnp.sum(b.astype(jnp.int32))
    # compact the boundary positions to the front: non-boundaries map to
    # the sentinel m, so sorting yields [start_0..start_{r-1}, m, m, ...]
    starts = jnp.sort(jnp.where(b, idx, m))
    vals = flat.at[jnp.minimum(starts, m - 1)].get(indices_are_sorted=True,
                                                   mode="clip")
    # run r ends where run r+1 starts; the init value m closes the last run
    # and zeroes the garbage tail (m - m)
    nxt = jnp.concatenate([starts[1:], jnp.full(1, m, jnp.int32)])
    lengths = jnp.maximum(nxt - starts, 0).astype(jnp.uint16)
    out = tuple(((vals >> (8 * p)) & 0xFF).astype(jnp.uint8)
                for p in range(planes))
    return out + (lengths, n_runs)


class RunLengthWire:
    """Compiled encode + bucket-sliced download of frame streams."""

    def __init__(self):
        self._encode = jax.jit(_encode, static_argnames=("row_len", "planes"))
        self._slice = jax.jit(
            lambda parts, n: tuple(lax.dynamic_slice(p, (0,), (n,))
                                   for p in parts),
            static_argnames=("n",))

    def encode(self, streams, row_len, planes=3):
        """Encode a list of (F, k*row_len) uint32 device arrays (``planes``
        significant bytes per element) as one stream with run breaks every
        ``row_len`` elements.

        Returns an opaque handle for :meth:`get`. All compute stays on
        device; nothing is downloaded yet.
        """
        row_len = int(row_len)
        assert 0 < row_len < 65536, "row breaks must bound runs below 2^16"
        assert 1 <= planes <= 4
        flat = jnp.concatenate([s.reshape(-1) for s in streams])
        assert flat.shape[0] % row_len == 0
        out = self._encode(flat, row_len=row_len, planes=int(planes))
        shapes = [tuple(s.shape) for s in streams]
        return {"parts": out[:-1], "n_runs": out[-1], "planes": int(planes),
                "shapes": shapes, "row_len": row_len,
                "streams": streams}

    def get_raw(self, handle):
        """Download the handle's wire payload WITHOUT decoding.

        One scalar readback (the run count), then one bucket-padded array
        download; falls back to the raw transfer when RLE would move more
        bytes than the original stream. Returns a host dict for
        :meth:`decode` — splitting download from decode lets callers
        dispatch the next chunk's device work before paying the (host CPU)
        decode, and hand the decode to a worker thread.
        """
        import os
        import time
        trace = os.environ.get("MMDYN_GEN_TRACE", "") not in ("", "0")
        t0 = time.perf_counter()
        m = sum(int(np.prod(s)) for s in handle["shapes"])
        n_runs = int(jax.device_get(handle["n_runs"]))
        t1 = time.perf_counter()
        planes = handle["planes"]
        bucket = min(_bucket(n_runs), m)
        if bucket * (planes + 2) >= m * 4:
            # pathological stream: raw is smaller — ship it directly
            parts = jax.device_get(tuple(handle["streams"]))
            return {"fallback": [np.asarray(p, np.uint32) for p in parts],
                    "shapes": handle["shapes"]}
        got = jax.device_get(self._slice(handle["parts"], n=bucket))
        if trace:
            import sys
            t2 = time.perf_counter()
            print(f"# wire-trace: sync(encode)={t1-t0:.2f}s "
                  f"dl[{bucket*(planes+2)/1e6:.1f}MB]={t2-t1:.2f}s "
                  f"runs={n_runs}", file=sys.stderr)
        raw = {f"v{p}": got[p][:n_runs] for p in range(planes)}
        raw.update(lengths=got[-1][:n_runs], shapes=handle["shapes"],
                   planes=planes)
        return raw

    @staticmethod
    def run_bounds(raw):
        """Per-stream [start, end) run-index ranges of a get_raw payload
        (row breaks guarantee run boundaries align to stream boundaries)."""
        ends = np.cumsum(raw["lengths"].astype(np.int64))
        offs = np.cumsum([0] + [int(np.prod(s)) for s in raw["shapes"]])
        marks = np.searchsorted(ends, offs[1:-1], side="right")
        return list(zip([0] + list(marks), list(marks) + [len(ends)]))

    @staticmethod
    def decode(raw):
        """get_raw payload -> list of host uint32 arrays with the original
        (F, k) stream shapes (exact inverse of encode)."""
        if "fallback" in raw:
            return raw["fallback"]
        v = np.zeros(raw["v0"].shape[0], np.uint32)
        for p in range(raw["planes"]):
            v |= raw[f"v{p}"].astype(np.uint32) << (8 * p)
        flat = np.repeat(v, raw["lengths"])
        out, off = [], 0
        for shape in raw["shapes"]:
            k = int(np.prod(shape))
            out.append(flat[off:off + k].reshape(shape))
            off += k
        return out

    def get(self, handle):
        """Download + decode (see get_raw/decode)."""
        return self.decode(self.get_raw(handle))
