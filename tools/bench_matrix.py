"""Benchmark matrix over the five BASELINE.json configs.

    python tools/bench_matrix.py [--steps 50] [--no-bf16]

Prints one JSON line per config (and a readable table on stderr):
  1. cnn-vae  visual     seq_modeling
  2. cnn-vae  tactile    seq_modeling
  3. cnn-mvae visuotactile (no pose) seq_modeling
  4. cnn-mvae visuotactile + pose    seq_modeling   (the headline, = bench.py)
  5. cnn-mvae visuotactile + pose    dyn_modeling   (all frames: B*T per step)
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CONFIGS = [
    dict(name="cnn-vae/visual/seq", model_name="cnn-vae", input_type="visual",
         use_pose=False, problem_type="seq_modeling"),
    dict(name="cnn-vae/tactile/seq", model_name="cnn-vae", input_type="tactile",
         use_pose=False, problem_type="seq_modeling"),
    dict(name="cnn-mvae/vt/seq", model_name="cnn-mvae",
         input_type="visuotactile", use_pose=False, problem_type="seq_modeling"),
    dict(name="cnn-mvae/vt+pose/seq", model_name="cnn-mvae",
         input_type="visuotactile", use_pose=True, problem_type="seq_modeling"),
    dict(name="cnn-mvae/vt+pose/dyn", model_name="cnn-mvae",
         input_type="visuotactile", use_pose=True, problem_type="dyn_modeling"),
]


def bench_config(spec, batch, steps, latent, bf16, seq_len):
    import jax
    import jax.numpy as jnp
    from mmdyn_tpu.models import setup_model
    from mmdyn_tpu.problems.base import ProblemConfig, make_optimizer
    from mmdyn_tpu.train.state import create_train_state
    from mmdyn_tpu.train.steps import make_train_step

    dt = "bfloat16" if bf16 else "float32"
    cfg = ProblemConfig(problem_type=spec["problem_type"],
                        model_name=spec["model_name"],
                        input_type=spec["input_type"],
                        use_pose=spec["use_pose"],
                        latent_size=latent, batchsize=batch, compute_dtype=dt)
    kwargs = dict(latent_size=latent, architecture="cnn", compute_dtype=dt)
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

    def full_sync(state, metrics):
        # host transfers force true completion (tunnel block_until_ready can
        # return early)
        loss = float(metrics["loss"])
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        float(jnp.sum(leaf))
        return loss

    key = jax.random.PRNGKey(1)
    kl = jnp.float32(1.0)
    key, sub = jax.random.split(key)
    state, metrics = step_fn(state, batch_data, sub, kl)
    full_sync(state, metrics)

    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch_data, sub, kl)
    loss = full_sync(state, metrics)
    step_time = (time.perf_counter() - t0) / steps

    # a dyn_modeling step consumes every frame in the batch (B*T);
    # seq_modeling consumes frame 0 of each sequence (B)
    frames = batch * (seq_len if spec["problem_type"] == "dyn_modeling" else 1)
    return frames / step_time, step_time, loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dyn-batch", type=int, default=256,
                    help="sequence batch for dyn_modeling (frames = B*T)")
    ap.add_argument("--seq-len", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--latent", type=int, default=256)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false", default=True)
    args = ap.parse_args()

    print(f"{'config':26} {'batch':>6} {'ms/step':>9} {'frames/s':>12}",
          file=sys.stderr)
    for spec in CONFIGS:
        batch = args.dyn_batch if spec["problem_type"] == "dyn_modeling" \
            else args.batch
        fps, step_time, loss = bench_config(spec, batch, args.steps,
                                            args.latent, args.bf16,
                                            args.seq_len)
        print(f"{spec['name']:26} {batch:>6} {step_time*1e3:>9.2f} "
              f"{fps:>12.0f}", file=sys.stderr)
        print(json.dumps({"config": spec["name"], "batch": batch,
                          "ms_per_step": round(step_time * 1e3, 3),
                          "frames_per_sec": round(fps, 1),
                          "loss": round(loss, 1), "bf16": args.bf16}))


if __name__ == "__main__":
    main()
