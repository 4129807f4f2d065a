"""Headline benchmark: cnn-mvae visuotactile+pose seq_modeling training
throughput (frames/sec/chip), vs the reference's PyTorch-CPU implementation.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

- value:       frames/sec/chip of the mmdyn_tpu jitted train step on the
               default JAX backend (TPU when present). A "frame" is one
               visuotactile+pose training example consumed by one optimizer
               step (batchsize / step_time).
- vs_baseline: value / frames-per-sec of a faithful PyTorch-CPU train step
               (the reference's sequential 3+4-pass MVAE evaluation with
               backward + Adam), measured in-process at a smaller batch and
               normalised per-frame.

Defaults measure the TPU-native production configuration: batch 512 (the
throughput saturation point on one chip), bfloat16 matmul/conv inputs (f32
accumulation), 50 dependency-chained steps ended by HOST TRANSFERS of the
loss and a final-state parameter (the tunnel's block_until_ready can return
with work still in flight; transfers cannot lie). Parity-mode training uses
f32 (--no-bf16).

Flags: --batch, --steps, --latent, --skip-torch (vs_baseline=0), --platform,
--no-bf16.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

METRIC = "cnn-mvae visuotactile+pose seq_modeling train throughput (frames/sec/chip)"


def build_train_setup(problem_type="seq_modeling", model_name="cnn-mvae",
                      input_type="visuotactile", use_pose=True, batch=512,
                      latent=256, compute_dtype="bfloat16_full", seq_len=2,
                      remat=False):
    """Build (cfg, model, state, tx, step_fn, batch_data) for a synthetic
    training-step benchmark. Shared by bench.py and tools/profile_step.py so
    both always measure the identical configuration."""
    import jax
    import jax.numpy as jnp
    from mmdyn_tpu.models import setup_model
    from mmdyn_tpu.problems.base import ProblemConfig, make_optimizer
    from mmdyn_tpu.train.state import create_train_state
    from mmdyn_tpu.train.steps import make_train_step

    cfg = ProblemConfig(problem_type=problem_type, model_name=model_name,
                        input_type=input_type, use_pose=use_pose,
                        latent_size=latent, batchsize=batch,
                        compute_dtype=compute_dtype, remat=remat)
    if compute_dtype == "auto":
        import dataclasses

        from mmdyn_tpu.problems.base import select_compute_dtype
        cfg = dataclasses.replace(
            cfg, compute_dtype=select_compute_dtype(cfg, seq_len))
        compute_dtype = cfg.compute_dtype
    kwargs = dict(latent_size=latent, architecture="cnn",
                  compute_dtype=compute_dtype)
    if cfg.is_mvae and cfg.cross_modal:
        kwargs["use_pose"] = cfg.use_pose
    model = setup_model(cfg.model_name, cross_modal=cfg.cross_modal, **kwargs)

    rng = np.random.default_rng(0)
    f32 = lambda *s: jnp.asarray(rng.uniform(size=s).astype(np.float32))
    batch_data = {
        "visual": f32(batch, seq_len, 64, 64, 3),
        "tactile": f32(batch, seq_len, 64, 64, 3),
        "pose": f32(batch, seq_len, 7),
        "avail": jnp.ones((batch, seq_len, 2), jnp.float32),
        "final_visual": f32(batch, 64, 64, 3),
        "final_tactile": f32(batch, 64, 64, 3),
        "final_pose": f32(batch, 7),
        "seg": jnp.ones((batch, seq_len, 64, 64, 3), jnp.float32),
    }

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    img = jnp.zeros((2, 64, 64, 3))
    if cfg.is_mvae and cfg.cross_modal:
        variables = model.init(
            {"params": ks[0], "dropout": ks[1], "reparam": ks[2]},
            [img, img], jnp.zeros((2, 7)) if cfg.use_pose else None)
    else:
        variables = model.init(
            {"params": ks[0], "dropout": ks[1], "reparam": ks[2]}, img)
    tx = make_optimizer(cfg)
    state = create_train_state(variables["params"], tx)
    step_fn = make_train_step(cfg, model, tx)
    return cfg, model, state, tx, step_fn, batch_data


def bench_train(problem_type="seq_modeling", model_name="cnn-mvae",
                input_type="visuotactile", use_pose=True, batch=512, steps=50,
                latent=256, bf16=True, seq_len=2, dtype=None):
    """Shared benchmark core: build the config/model/state, run `steps`
    dependency-chained train steps, and time them ending with host transfers
    (the tunnel's block_until_ready can return with work still in flight;
    transfers cannot lie). Returns (frames_per_sec, step_time, loss)."""
    import jax
    import jax.numpy as jnp

    compute_dtype = dtype or ("bfloat16" if bf16 else "float32")
    cfg, model, state, tx, step_fn, batch_data = build_train_setup(
        problem_type=problem_type, model_name=model_name,
        input_type=input_type, use_pose=use_pose, batch=batch, latent=latent,
        compute_dtype=compute_dtype, seq_len=seq_len)

    def full_sync(state, metrics):
        loss = float(metrics["loss"])
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        float(jnp.sum(leaf))
        return loss

    key = jax.random.PRNGKey(1)
    kl = jnp.float32(1.0)
    # warmup / compile
    key, sub = jax.random.split(key)
    state, metrics = step_fn(state, batch_data, sub, kl)
    full_sync(state, metrics)

    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch_data, sub, kl)
    loss = full_sync(state, metrics)
    step_time = (time.perf_counter() - t0) / steps

    # dyn_modeling consumes every frame (B*T); seq_modeling consumes frame 0
    frames = batch * (seq_len if problem_type == "dyn_modeling" else 1)
    return frames / step_time, step_time, loss


def bench_jax(batch, steps, latent, bf16=False, dtype=None):
    fps, step_time, loss = bench_train(batch=batch, steps=steps, latent=latent,
                                       bf16=bf16, dtype=dtype)
    return fps, step_time, loss


def bench_gen(trials=2, steps=300, interval=10):
    """Warm ``--device-physics`` data-generation probe.

    One vmapped analytic rollout (sphere drop, the exp_1 scene shape) +
    packed device rendering + RLE wire + host PNG writes for ``trials``
    trials, timed AFTER a full compile/warmup pass — the steady-state
    corpus-generation throughput (docs/PARITY.md "Device-side data
    generation"), tracked per round so the headline capability regresses
    visibly like the train configs do. Returns (frames_per_sec, seconds).
    """
    import tempfile

    from mmdyn_tpu.cli._simrun import run_trials_device_physics
    from mmdyn_tpu.sim import config as sim_config
    from mmdyn_tpu.sim.physics import setup_backend
    from mmdyn_tpu.sim.sensor import make_sensor

    backend = setup_backend(time_step=sim_config.TIME_STEP, renders=False,
                            gravity=True, engine="analytic")
    sensor = make_sensor(backend, size=[1.5, 1.5, 1], position=[0, 0, 0.5],
                         sensor_vector=[0, 0, 1], thickness=0.005,
                         use_force=False, constrained=False)
    obj_id = backend.add_sphere(0.15, [0.0, 0.0, 1.5], mass=1.0,
                                color=(0.8, 0.3, 0.2))
    states = [{obj_id: (np.array([0.03 * k, -0.02 * k, 1.5]),
                        np.array([0.0, 0.0, 0.0, 1.0]))}
              for k in range(trials)]
    frames = trials * (steps // interval)

    def once():
        with tempfile.TemporaryDirectory() as td:
            paths = [Path(td) / f"seq_{k:04d}" for k in range(trials)]
            t0 = time.perf_counter()
            out = run_trials_device_physics(backend, sensor, obj_id, states,
                                            steps, interval, paths)
            dt = time.perf_counter() - t0
            assert all(r is not None for r in out), "blank-guard skipped a trial"
            return dt

    once()                       # compile warmup
    dt = once()
    backend.disconnect()
    return frames / dt, dt


def bench_torch_cpu(batch, steps, latent):
    """Reference-semantics PyTorch-CPU train step (sequential subset passes)."""
    import torch
    from tests.torch_reference import GoldMVAE, gold_mvae_evaluate

    torch.manual_seed(0)
    model = GoldMVAE(latent_size=latent, use_pose=True)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    xv = torch.rand(batch, 3, 64, 64)
    xt = torch.rand(batch, 3, 64, 64)
    xp = torch.rand(batch, 7)

    def one_step():
        opt.zero_grad()
        loss = gold_mvae_evaluate(model, xv, xt, xp, kl_weight=1.0,
                                  pose_multiplier=1000.0)
        loss.backward()
        opt.step()
        return float(loss)

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = (time.perf_counter() - t0) / steps
    return batch / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--latent", type=int, default=256)
    ap.add_argument("--torch-batch", type=int, default=16)
    ap.add_argument("--torch-steps", type=int, default=2)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    ap.add_argument("--dtype", default="auto",
                    choices=["auto", "float32", "bfloat16", "bfloat16_full"],
                    help="Activation policy (--no-bf16 forces float32); "
                         "'auto' picks by the measured batch-size crossover "
                         "(bfloat16_full at the saturated defaults: +12%% "
                         "over bfloat16 on this bandwidth-bound step)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--skip-dyn", action="store_true",
                    help="skip the secondary dyn_modeling measurement")
    ap.add_argument("--skip-vae", action="store_true",
                    help="skip the secondary single-modality VAE measurement")
    ap.add_argument("--skip-serving", action="store_true",
                    help="skip the serving-latency measurement")
    ap.add_argument("--skip-gen", action="store_true",
                    help="skip the --device-physics data-generation probe")
    ap.add_argument("--serve-batch", type=int, default=256)
    ap.add_argument("--dyn-batch", type=int, default=256)
    ap.add_argument("--vae-batch", type=int, default=1024)
    ap.add_argument("--dyn-seq-len", type=int, default=8)
    args = ap.parse_args()

    if args.platform:
        import os
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platform_name", args.platform)

    from mmdyn_tpu.utils.compile_cache import maybe_enable
    maybe_enable()
    dtype = args.dtype if args.bf16 else "float32"
    fps, step_time, loss = bench_jax(args.batch, args.steps, args.latent,
                                     bf16=args.bf16, dtype=dtype)
    print(f"# jax: {fps:.1f} frames/s  ({step_time*1e3:.2f} ms/step, "
          f"batch {args.batch}, loss {loss:.1f})", file=sys.stderr)

    result = {
        "metric": METRIC,
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": 0.0,
    }

    # secondary: the dyn_modeling step (every frame of B sequences x T frames
    # per optimizer step) so a regression in the weakest config is visible in
    # the round artifact, not only in tools/bench_matrix.py
    if not args.skip_dyn:
        dfps, dstep, _ = bench_train(
            problem_type="dyn_modeling", batch=args.dyn_batch,
            steps=max(args.steps // 2, 10), latent=args.latent,
            bf16=args.bf16, seq_len=args.dyn_seq_len, dtype=dtype)
        print(f"# jax dyn: {dfps:.1f} frames/s ({dstep*1e3:.2f} ms/step, "
              f"batch {args.dyn_batch}x{args.dyn_seq_len})", file=sys.stderr)
        result["dyn_frames_per_sec"] = round(dfps, 2)
        result["dyn_ms_per_step"] = round(dstep * 1e3, 3)

    # secondary: the single-modality cnn-vae path (the fastest production
    # config) so a regression there surfaces in BENCH_r*.json round over
    # round. The VAE is lighter per frame and only saturates the chip at
    # ~2x the flagship batch (docs/PARITY.md benchmark matrix: 71k fps at
    # 512, 131k at 1024), so it is benchmarked at its own operating point.
    if not args.skip_vae:
        vfps, vstep, _ = bench_train(
            problem_type="seq_modeling", model_name="cnn-vae",
            input_type="visual", use_pose=False, batch=args.vae_batch,
            steps=max(args.steps // 2, 10), latent=args.latent,
            bf16=args.bf16, dtype=dtype)
        print(f"# jax vae: {vfps:.1f} frames/s ({vstep*1e3:.2f} ms/step, "
              f"batch {args.vae_batch})", file=sys.stderr)
        result["vae_frames_per_sec"] = round(vfps, 2)
        result["vae_ms_per_step"] = round(vstep * 1e3, 3)

    # serving: AOT predictor of the same flagship model — batch-1 round trip
    # (dispatch + full device_get) and pipelined device step at the serving
    # batch (in-order dispatches, one readback); see tools/bench_infer.py
    if not args.skip_serving:
        import jax
        import jax.numpy as jnp
        from mmdyn_tpu.problems.base import ProblemConfig
        from mmdyn_tpu.serve import InferenceSession

        cfg, model, state, _, _, _ = build_train_setup(
            batch=2, latent=args.latent, compute_dtype=dtype)
        sess = InferenceSession(cfg, state.params)
        mods = ("pose", "tactile", "visual")
        key = jax.random.PRNGKey(0)

        def serve_inputs(b):
            return {m: jax.random.uniform(key, (b, 7) if m == "pose"
                                          else (b, 64, 64, 3)) for m in mods}

        c1 = sess.aot_predict(1, mods, uint8_images=True)
        in1 = serve_inputs(1)
        jax.device_get(c1(sess.variables, in1, None, key))
        t0 = time.perf_counter()
        for _ in range(10):
            jax.device_get(c1(sess.variables, in1, None, key))
        rtt = (time.perf_counter() - t0) / 10

        cb = sess.aot_predict(args.serve_batch, mods, uint8_images=True)
        inb = serve_inputs(args.serve_batch)
        out = cb(sess.variables, inb, None, key)
        float(jnp.sum(out["mu"]))
        t0 = time.perf_counter()
        for _ in range(30):
            out = cb(sess.variables, inb, None, key)
        float(jnp.sum(out["mu"]))   # in-order execution: one sync for all
        pipe = (time.perf_counter() - t0) / 30
        print(f"# jax serving: batch-1 rtt {rtt*1e3:.1f} ms, batch "
              f"{args.serve_batch} pipelined {pipe*1e3:.2f} ms "
              f"({args.serve_batch/pipe:.0f} frames/s)", file=sys.stderr)
        result["serving_batch1_rtt_ms"] = round(rtt * 1e3, 2)
        result["serving_pipelined_ms"] = round(pipe * 1e3, 3)
        result["serving_frames_per_sec"] = round(args.serve_batch / pipe, 1)

    # data generation: the warm --device-physics corpus pipeline (vmapped
    # physics + packed rendering + RLE wire + PNG writes), a fixed 2x30-frame
    # probe so the round artifact tracks the generation capability too
    if not args.skip_gen:
        gfps, gdt = bench_gen()
        print(f"# jax gen: {gfps:.1f} frames/s (60 frames in {gdt:.2f} s, "
              f"--device-physics probe)", file=sys.stderr)
        result["gen_frames_per_sec"] = round(gfps, 2)

    if not args.skip_torch:
        tfps, tstep = bench_torch_cpu(args.torch_batch, args.torch_steps,
                                      args.latent)
        print(f"# torch-cpu: {tfps:.1f} frames/s ({tstep*1e3:.1f} ms/step, "
              f"batch {args.torch_batch})", file=sys.stderr)
        result["vs_baseline"] = round(fps / tfps, 2)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
