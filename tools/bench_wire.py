"""A/B microbenchmark of RLE run-start extraction lowerings (utils/wire.py).

The device RLE encode is the critical path of --device-physics corpus
generation (docs/PARITY.md: flush 31 s of a 32 s object group, dominated by
a scatter-min that runs ~30M elem/s). The encode needs ONE compaction — the
sorted positions of run boundaries — and there is more than one way to lower
it on TPU:

  scatter   full(m).at[rid].min(iota)         (round-4 production: scatter)
  search    searchsorted(cumsum(b), 1..m)     (pure gathers: binary search
                                               over the monotone boundary
                                               count; scatters serialise on
                                               TPU, gathers don't)
  sort      sort(where(b, iota, m))           (one XLA sort of m keys)

All three share the same post-processing contract (tail entries == m give
zero-length runs), so the winner drops into wire._encode unchanged. Each
candidate is compiled standalone, warmed, and timed with a dependency chain
ended by a host readback (block_until_ready lies through the tunnel).

Usage: python tools/bench_wire.py [--frames 128] [--iters 5] [--check]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def make_starts_fns():
    import jax
    import jax.numpy as jnp
    from jax import lax

    def boundaries(flat, row_len):
        m = flat.shape[0]
        idx = lax.iota(jnp.int32, m)
        prev = jnp.concatenate([flat[:1], flat[:-1]])
        return (flat != prev) | ((idx % row_len) == 0), idx, m

    def scatter(flat, row_len):
        b, idx, m = boundaries(flat, row_len)
        rid = jnp.cumsum(b.astype(jnp.int32)) - 1
        return jnp.full(m, m, jnp.int32).at[rid].min(
            idx, indices_are_sorted=True)

    def search(flat, row_len):
        b, idx, m = boundaries(flat, row_len)
        csum = jnp.cumsum(b.astype(jnp.int32))
        return jnp.searchsorted(csum, idx + 1, side="left").astype(jnp.int32)

    def sort(flat, row_len):
        b, idx, m = boundaries(flat, row_len)
        return jnp.sort(jnp.where(b, idx, m))

    return {"scatter": scatter, "search": search, "sort": sort}


def realistic_stream(frames, h=480, w=640, runs_per_frame=68000, seed=0):
    """Synthetic uint32 stream with exp_1-like run statistics (~68k runs per
    640x480 frame, docs/PARITY.md)."""
    rng = np.random.default_rng(seed)
    out = np.empty((frames, h * w), np.uint32)
    n_splits = max(runs_per_frame - h, 1)  # row breaks contribute h runs
    for f in range(frames):
        cuts = np.sort(rng.choice(h * w - 1, size=n_splits, replace=False)) + 1
        vals = rng.integers(0, 1 << 24, size=n_splits + 1, dtype=np.uint32)
        row = np.zeros(h * w, np.uint32)
        row[cuts] = 1
        out[f] = vals[np.cumsum(row)]
    return out.reshape(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--row-len", type=int, default=640)
    ap.add_argument("--check", action="store_true",
                    help="assert all candidates agree (CPU-sized input)")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import os
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platform_name", args.platform)
    from mmdyn_tpu.utils.compile_cache import maybe_enable
    maybe_enable()
    import jax

    import jax.numpy as jnp

    fns = make_starts_fns()
    if args.check:
        flat = jnp.asarray(realistic_stream(2))
        outs = {k: np.asarray(jax.jit(f, static_argnames="row_len")(
            flat, row_len=args.row_len)) for k, f in fns.items()}
        for k, v in outs.items():
            np.testing.assert_array_equal(v, outs["scatter"], err_msg=k)
        print("# all candidates agree", file=sys.stderr)

    flat = jnp.asarray(realistic_stream(args.frames))
    m = flat.shape[0]
    print(f"# stream: {m/1e6:.1f}M elements ({args.frames} frames x 2 "
          f"streams equivalent)", file=sys.stderr)
    results = {}
    for name, f in fns.items():
        jf = jax.jit(f, static_argnames="row_len")
        out = jf(flat, row_len=args.row_len)
        int(np.asarray(out[-1]))            # compile + warm, host sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jf(flat, row_len=args.row_len)
        int(np.asarray(out[-1]))            # one readback ends the chain
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt
        print(f"# {name:8s} {dt*1e3:8.1f} ms  ({m/dt/1e6:.0f}M elem/s)",
              file=sys.stderr)
    best = min(results, key=results.get)
    print({"best": best,
           **{k: round(v * 1e3, 2) for k, v in results.items()}})


if __name__ == "__main__":
    main()
