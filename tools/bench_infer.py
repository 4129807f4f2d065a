"""Serving latency/throughput benchmark for a trained run (or a fresh init).

Measures the InferenceSession AOT predictor across batch sizes:

* round-trip latency: dispatch + full host readback of the predictions per
  call — what one serving request experiences (on the tunneled chip the
  host<->device hop alone is ~18 ms);
* pipelined throughput: N async dispatches, then one tiny readback of the
  LAST call's output — the device executes launches in order, so this bounds
  all N steps with a single sync (dispatch latency hides behind compute);
* rollout throughput: closed-loop dynamics steps/s (lax.scan on device, one
  dispatch regardless of horizon).

NOTE: jax.block_until_ready returns early through the axon tunnel (async
completion is decoupled from data availability); every sync here is a host
readback, which is also the honest serving semantics.

Usage:
    python tools/bench_infer.py [--run logs/run_...] [--batch-sizes 1,8,64,256]
    (no --run: benchmarks a randomly initialised flagship cnn-mvae+pose)

Prints one JSON line per configuration.
"""

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser():
    p = argparse.ArgumentParser(description="Serving latency benchmark")
    p.add_argument("--run", default=None, type=str,
                   help="run dir (default: fresh-init flagship model)")
    p.add_argument("--batch-sizes", default="1,8,64,256", type=str)
    p.add_argument("--iters", default=30, type=int)
    p.add_argument("--warmup", default=3, type=int)
    p.add_argument("--rollout", default=50, type=int,
                   help="rollout horizon for the scan benchmark (0 = skip)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16", "bfloat16_full"],
                   help="serving compute dtype (params stay f32; bfloat16 "
                        "feeds the MXU at full rate)")
    p.add_argument("--platform", default=None, type=str)
    return p


def fresh_session(dtype="float32"):
    """Flagship config (cnn-mvae visuotactile+pose) with random params."""
    import jax
    import jax.numpy as jnp

    from mmdyn_tpu.models.factory import setup_model
    from mmdyn_tpu.problems.base import ProblemConfig
    from mmdyn_tpu.serve import InferenceSession

    cfg = ProblemConfig(problem_type="seq_modeling", model_name="cnn-mvae",
                        input_type="visuotactile", use_pose=True,
                        compute_dtype=dtype)
    model = setup_model(cfg.model_name, cross_modal=True,
                        latent_size=cfg.latent_size, use_pose=True,
                        architecture="cnn", conditional=False,
                        categorical_conditions=False, condition_dim=None,
                        compute_dtype=cfg.compute_dtype)
    img = jnp.zeros((2, 64, 64, 3))
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "reparam": jax.random.PRNGKey(2)}
    params = model.init(rngs, [img, img], jnp.zeros((2, 7)), None)["params"]
    return InferenceSession(cfg, params)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import os
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platform_name", args.platform)
    from mmdyn_tpu.utils.compile_cache import maybe_enable
    maybe_enable()
    import jax.numpy as jnp

    from mmdyn_tpu.serve import InferenceSession

    session = (InferenceSession.from_run(args.run,
                                         compute_dtype=args.dtype)
               if args.run else fresh_session(args.dtype))
    cfg = session.cfg
    modalities = ["visual", "tactile"] if cfg.cross_modal else [cfg.input_type]
    if cfg.use_pose:
        modalities.append("pose")
    key = jax.random.PRNGKey(0)

    def measure(compiled, inputs):
        run = lambda: compiled(session.variables, inputs, None, key)

        def sync(out):
            # block_until_ready is not a real barrier through the tunnel —
            # only materialising a value is
            return float(jax.numpy.sum(out["mu"]))

        for _ in range(args.warmup):
            sync(run())
        lat = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.device_get(run())   # full-payload readback (one batched RPC)
            lat.append((time.perf_counter() - t0) * 1e3)
        lat.sort()
        p50 = statistics.median(lat)
        p95 = lat[min(len(lat) - 1, int(len(lat) * 0.95))]

        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = run()
        sync(out)                   # in-order execution: syncs all iters
        pipelined = (time.perf_counter() - t0) / args.iters
        return p50, p95, pipelined

    for bs in [int(b) for b in args.batch_sizes.split(",")]:
        inputs = {m: (jax.random.uniform(jax.random.fold_in(key, i), (bs, 7))
                      if m == "pose" else
                      jax.random.uniform(jax.random.fold_in(key, i),
                                         (bs, 64, 64, 3)))
                  for i, m in enumerate(modalities)}
        row = {"metric": "serving latency", "batch": bs}
        for tag, u8 in (("f32", False), ("uint8", True)):
            compiled = session.aot_predict(bs, tuple(modalities),
                                           uint8_images=u8)
            p50, p95, pipelined = measure(compiled, inputs)
            row[f"p50_ms_{tag}"] = round(p50, 3)
            row[f"p95_ms_{tag}"] = round(p95, 3)
            if u8:
                row["pipelined_ms"] = round(pipelined * 1e3, 3)
                row["frames_per_s"] = round(bs / pipelined, 1)
        print(json.dumps(row))

    if args.rollout and cfg.problem_type != "regression":
        init = {m: v[:1] for m, v in inputs.items()}
        traj = session.rollout(args.rollout, **init)   # compile
        float(traj["mu"][-1, 0, 0])
        t0 = time.perf_counter()
        for _ in range(5):
            traj = session.rollout(args.rollout, **init)
            float(traj["mu"][-1, 0, 0])
        dt = (time.perf_counter() - t0) / 5
        print(json.dumps({
            "metric": "rollout", "horizon": args.rollout, "batch": 1,
            "total_ms": round(dt * 1e3, 3),
            "steps_per_s": round(args.rollout / dt, 1),
        }))


if __name__ == "__main__":
    main()
