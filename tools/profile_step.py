"""Profile the flagship train step: HLO cost, measured step time, MFU, and
per-segment attribution (encode / PoE+reparam / decode / loss / backward).

    python tools/profile_step.py --batch 512 --trace-dir docs/traces/b512

Outputs one JSON line with:
  * flops_per_step (HLO cost analysis of the compiled step),
  * step_time_ms (dependency-chained, host-transfer-synced — the tunnel's
    block_until_ready can return early),
  * mfu_pct vs the chip's peak (v5e bf16 197 TFLOP/s by default),
  * segment timings: forward-only, encode-only, decode-only, loss-only —
    backward+optimizer time is full minus forward.

Optionally writes a jax.profiler trace for offline op-level inspection.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

V5E_PEAK_FLOPS = {"bfloat16": 197e12, "float32": 98.5e12}


def build(batch, latent, bf16, remat=False, dtype=None,
          problem_type="seq_modeling", seq_len=2):
    """Delegates to bench.build_train_setup so this tool and bench.py always
    measure the identical configuration."""
    from bench import build_train_setup

    compute_dtype = dtype or ("bfloat16" if bf16 else "float32")
    return build_train_setup(problem_type=problem_type, batch=batch,
                             latent=latent, compute_dtype=compute_dtype,
                             seq_len=seq_len, remat=remat)


def timed(fn, args, steps, sync):
    """Issue `steps` async dispatches, end with a host transfer."""
    out = fn(*args)
    sync(out)                                   # compile + warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--latent", type=int, default=256)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false",
                    default=True)
    ap.add_argument("--remat", action="store_true", default=False)
    ap.add_argument("--dtype", default=None,
                    choices=["float32", "bfloat16", "bfloat16_full"])
    ap.add_argument("--problem", default="seq_modeling",
                    choices=["seq_modeling", "dyn_modeling"])
    ap.add_argument("--seq-len", type=int, default=2,
                    help="frames per sequence (dyn_modeling consumes all)")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import os
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platform_name", args.platform)

    import jax
    import jax.numpy as jnp
    from mmdyn_tpu.problems.reconstruction import mvae_evaluate

    cfg, model, state, tx, step_fn, data = build(args.batch, args.latent,
                                                 args.bf16, remat=args.remat,
                                                 dtype=args.dtype,
                                                 problem_type=args.problem,
                                                 seq_len=args.seq_len)
    key = jax.random.PRNGKey(1)
    kl = jnp.float32(1.0)

    def sync_state(out):
        s, m = out
        float(m["loss"])
        float(jnp.sum(jax.tree_util.tree_leaves(s.params)[0]))

    def sync_scalar(x):
        float(jnp.sum(x if not isinstance(x, tuple) else x[0]))

    # --- full train step: cost analysis + timing --------------------------------
    lowered = step_fn.lower(state, data, key, kl)   # already jitted
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    # the step donates its input state; thread it through the chain
    run_state, metrics = step_fn(state, data, key, kl)
    sync_state((run_state, metrics))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        run_state, metrics = step_fn(run_state, data, key, kl)
    sync_state((run_state, metrics))
    t_full = (time.perf_counter() - t0) / args.steps
    state = jax.tree_util.tree_map(jnp.copy, run_state)  # fresh, undonated

    # --- segments (seq_modeling shapes only) -------------------------------------
    do_segments = args.problem == "seq_modeling"
    mcls = type(model)
    variables = {"params": state.params}
    inputs = {"visual": data["visual"][:, 0], "tactile": data["tactile"][:, 0],
              "pose": data["pose"][:, 0]}
    targets = {"visual": data["final_visual"], "tactile": data["final_tactile"],
               "pose": data["final_pose"]}

    @jax.jit
    def fwd_loss(params, key):
        loss, _ = mvae_evaluate(model, {"params": params}, key, inputs,
                                targets, kl, cfg)
        return loss

    @jax.jit
    def encode_only(params, key):
        kd_v, kd_t = jax.random.split(key)
        mu_v, lv_v = model.apply({"params": params}, inputs["visual"], None,
                                 method=mcls.encode_visual,
                                 rngs={"dropout": kd_v})
        mu_t, lv_t = model.apply({"params": params}, inputs["tactile"], None,
                                 method=mcls.encode_tactile,
                                 rngs={"dropout": kd_t})
        mu_p, lv_p = model.apply({"params": params}, inputs["pose"],
                                 method=mcls.encode_pose)
        return mu_v + mu_t + mu_p + lv_v + lv_t + lv_p

    z_all = jnp.zeros((4, args.batch, args.latent),
                      jnp.bfloat16 if args.bf16 else jnp.float32)

    @jax.jit
    def decode_only(params, z):
        rv = jax.vmap(lambda zz: model.apply({"params": params}, zz, None,
                                             method=mcls.decode_visual))(z)
        rt = jax.vmap(lambda zz: model.apply({"params": params}, zz, None,
                                             method=mcls.decode_tactile))(z)
        return jnp.sum(rv) + jnp.sum(rt)

    recons = jnp.zeros((4, args.batch, 64 * 64 * 3), jnp.float32)

    @jax.jit
    def loss_only(recons):
        from mmdyn_tpu.ops.kernels import fused_masked_bce_sum
        tgt = jnp.reshape(targets["visual"], (args.batch, -1))
        return fused_masked_bce_sum(recons, tgt, None)

    k2 = jax.random.PRNGKey(2)
    t_fwd = t_enc = t_dec = t_loss = None
    if do_segments:
        t_fwd = timed(lambda: fwd_loss(state.params, k2), (), args.steps,
                      sync_scalar)
        t_enc = timed(lambda: encode_only(state.params, k2), (), args.steps,
                      sync_scalar)
        t_dec = timed(lambda: decode_only(state.params, z_all), (), args.steps,
                      sync_scalar)
        t_loss = timed(lambda: loss_only(recons), (), args.steps, sync_scalar)

    # --- optional trace -----------------------------------------------------------
    if args.trace_dir:
        # the step donates its input state — thread it through the chain
        trace_state = jax.tree_util.tree_map(jnp.copy, state)
        with jax.profiler.trace(args.trace_dir):
            out = None
            for _ in range(3):
                out = step_fn(trace_state, data, key, kl)
                trace_state = out[0]
            sync_state(out)
        print(f"# trace written to {args.trace_dir}", file=sys.stderr)

    dtype = args.dtype or ("bfloat16" if args.bf16 else "float32")
    peak_key = "bfloat16" if dtype.startswith("bfloat16") else "float32"
    on_tpu = jax.default_backend() == "tpu"
    peak = V5E_PEAK_FLOPS[peak_key] if on_tpu else None
    result = {
        "backend": jax.default_backend(),
        "problem": args.problem, "seq_len": args.seq_len,
        "batch": args.batch, "latent": args.latent, "dtype": dtype,
        "flops_per_step": flops,
        "gbytes_accessed": round(bytes_acc / 1e9, 3),
        "step_time_ms": round(t_full * 1e3, 3),
        "achieved_tflops": round(flops / t_full / 1e12, 2),
        "mfu_pct": (round(flops / t_full / peak * 100, 2) if peak else None),
        "arithmetic_intensity": round(flops / max(bytes_acc, 1), 1),
    }
    if do_segments:
        result["segments_ms"] = {
            "full_fwd_bwd_adam": round(t_full * 1e3, 3),
            "forward_loss": round(t_fwd * 1e3, 3),
            "encode_3x": round(t_enc * 1e3, 3),
            "decode_2x4_subsets": round(t_dec * 1e3, 3),
            "fused_bce_loss": round(t_loss * 1e3, 3),
            "backward_plus_adam_est": round((t_full - t_fwd) * 1e3, 3),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
