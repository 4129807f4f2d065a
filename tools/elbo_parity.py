"""Training-trajectory parity harness: train mmdyn_tpu and a
reference-semantics PyTorch implementation side by side on the SAME data and
compare loss trajectories.

The torch side is the golden reimplementation from tests/torch_reference.py —
same architecture, same sequential subset-pass evaluation as the reference
problems.py. Both sides use Adam(lr), the same KL-annealing schedule and the
same batches in the same order. Supported problems:

  * ``seq_modeling``  — input = frame 0 per sequence, target = resting frame
                        (problems.py:634-673); the round-2 headline config.
  * ``dyn_modeling``  — input = every frame (B*T flattened), target =
                        roll(-1) with the resting-frame patch at sequence
                        ends; pose targets rolled WITHOUT the patch,
                        replicating problems.py:765-803 exactly.
  * ``regression``    — visual frame 0 -> final 7-D pose, MSE-sum
                        (problems.py:263-359).

Stochasticity controls for root-cause experiments (docs/PARITY.md):
  --noise-free    z = posterior mean on BOTH sides (no reparam noise)
  --no-dropout    Dropout(0.1) disabled on BOTH sides (the default runs
                  dropout symmetrically: active in jax AND torch)
  --shared-init   transplant the jax initial weights into torch, removing
                  init-distribution differences

    python tools/elbo_parity.py --problem dyn_modeling \
        --dataset data_runs/exp1_full --n-seq 64 --batch 8 --epochs 30

Prints one JSON line:
    {"final_gap_pct": ..., "jax_elbo": [...], "torch_elbo": [...]}
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


# ---------------------------------------------------------------------------
# data
# ---------------------------------------------------------------------------

def make_synthetic_sequences(n_seq, seq_len=4, seed=0, shock_dim=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: rng.uniform(size=s).astype(np.float32)
    seqs = {
        "visual": f(n_seq, seq_len, 64, 64, 3),
        "tactile": f(n_seq, seq_len, 64, 64, 3),
        "pose": f(n_seq, seq_len, 7),
        "final_visual": f(n_seq, 64, 64, 3),
        "final_tactile": f(n_seq, 64, 64, 3),
        "final_pose": f(n_seq, 7),
    }
    if shock_dim:
        # a per-sequence shock, constant over frames (exp_3 logs one shock
        # per trial, exp_3_force_pert.py:125-140)
        seqs["shock"] = np.repeat(f(n_seq, 1, shock_dim), seq_len, axis=1)
    return seqs


def load_compiled_sequences(path, n_seq=None):
    """Full (n, T, ...) sequence arrays from a compiled dataset."""
    from mmdyn_tpu.data.compile import COMPILED_NAME, load_packed

    p = Path(path)
    if p.is_dir() and not (p / "visual.npy").exists():
        p = p / COMPILED_NAME
    d = load_packed(p)
    n = d["visual"].shape[0] if n_seq is None else min(n_seq,
                                                       d["visual"].shape[0])
    to_f = lambda a: (np.asarray(a, np.float32) / 255.0
                      if a.dtype == np.uint8 else np.asarray(a, np.float32))
    seqs = {
        "visual": to_f(d["visual"][:n]),
        "tactile": to_f(d["tactile"][:n]),
        "pose": np.asarray(d["pose"][:n], np.float32),
        "final_visual": to_f(d["final_visual"][:n]),
        "final_tactile": to_f(d["final_tactile"][:n]),
        "final_pose": np.asarray(d["final_pose"][:n], np.float32),
    }
    if "shock" in d and np.ndim(d["shock"]) == 3:
        seqs["shock"] = np.asarray(d["shock"][:n], np.float32)
    return seqs


def dyn_flatten_roll(x_bt, final):
    """The reference dyn_modeling target construction on a (B, T, ...) block
    (problems.py:765-803): flatten to (B*T, ...), roll -1 along the flattened
    axis, patch each sequence's last step with the resting frame."""
    b, t = x_bt.shape[:2]
    flat = x_bt.reshape((b * t,) + x_bt.shape[2:])
    tgt = np.roll(flat, -1, axis=0).copy()
    tgt[t - 1::t] = final
    return flat, tgt


# ---------------------------------------------------------------------------
# jax side — uses the production parse/evaluate path
# ---------------------------------------------------------------------------

def run_jax(seqs, args, seed=0, init_params_out=None):
    import jax
    import jax.numpy as jnp
    import optax
    from mmdyn_tpu.models import setup_model
    from mmdyn_tpu.problems.base import ProblemConfig, anneal_kl
    from mmdyn_tpu.problems.specs import evaluate, parse_batch
    from mmdyn_tpu.train.state import create_train_state

    is_reg = args.problem == "regression"
    cond_dim = (seqs["shock"].shape[-1]
                if getattr(args, "conditional", False) else 0)
    cfg = ProblemConfig(
        problem_type=args.problem,
        model_name="regressor" if is_reg else "cnn-mvae",
        input_type="visual" if is_reg else "visuotactile",
        use_pose=not is_reg, latent_size=args.latent, batchsize=args.batch,
        lr=args.lr, annealing_epochs=args.anneal, compute_dtype=args.dtype,
        conditional=cond_dim > 0, condition_dim=cond_dim,
        noise_free=args.noise_free)
    drop = 0.0 if args.no_dropout else 0.1
    if is_reg:
        model = setup_model("regressor", out_dim=7, dropout_rate=drop,
                            compute_dtype=args.dtype)
    else:
        model = setup_model("cnn-mvae", cross_modal=True,
                            latent_size=args.latent, use_pose=True,
                            conditional=cond_dim > 0, condition_dim=cond_dim,
                            dropout_rate=drop, compute_dtype=args.dtype)

    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    rngs = {"params": ks[0], "dropout": ks[1], "reparam": ks[2]}
    img = jnp.zeros((2, 64, 64, 3))
    cond0 = jnp.zeros((2, cond_dim)) if cond_dim else None
    if is_reg:
        variables = model.init(rngs, img)
    else:
        variables = model.init(rngs, [img, img], jnp.zeros((2, 7)), cond0)
    if init_params_out is not None:
        init_params_out.append(jax.tree_util.tree_map(np.asarray,
                                                      variables["params"]))
    tx = optax.adam(args.lr)
    state = create_train_state(variables["params"], tx)

    @jax.jit
    def step(state, batch, key, klw):
        def loss_fn(params):
            inputs, targets = parse_batch(cfg, batch)
            loss, _ = evaluate(cfg, model, {"params": params}, key, inputs,
                               targets, klw)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    n = seqs["visual"].shape[0]
    nb = n // args.batch
    key = jax.random.PRNGKey(seed + 1)
    history = []
    for epoch in range(args.epochs):
        klw = jnp.float32(anneal_kl(epoch, args.anneal))
        losses = []
        for b in range(nb):
            sl = slice(b * args.batch, (b + 1) * args.batch)
            batch = {k: jnp.asarray(v[sl]) for k, v in seqs.items()}
            key, sub = jax.random.split(key)
            state, loss = step(state, batch, sub, klw)
            losses.append(float(loss))
        history.append(float(np.mean(losses)))
        print(f"# jax epoch {epoch}: {history[-1]:.2f}", file=sys.stderr)
    return history


# ---------------------------------------------------------------------------
# torch side — reference-semantics sequential passes
# ---------------------------------------------------------------------------

def run_torch(seqs, args, seed=0, init_params=None):
    import torch
    from tests.torch_reference import (GoldMVAE, GoldRegressor, gold_poe,
                                       gold_mvae_elbo, load_mvae,
                                       load_regressor)
    from mmdyn_tpu.problems.base import anneal_kl

    torch.manual_seed(seed)
    is_reg = args.problem == "regression"
    dropout = not args.no_dropout
    cond_dim = (seqs["shock"].shape[-1]
                if getattr(args, "conditional", False) else 0)
    if is_reg:
        model = GoldRegressor(out_dim=7, dropout=dropout)
        if init_params is not None:
            load_regressor(model, init_params)
    else:
        model = GoldMVAE(latent_size=args.latent, use_pose=True,
                         dropout=dropout, condition_dim=cond_dim)
        if init_params is not None:
            load_mvae(model, init_params)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=args.lr)

    to_img = lambda a: torch.tensor(a.transpose(0, 3, 1, 2))

    def mvae_eval(m, bv, bt, bp, gv, gt, gp, klw, cond=None):
        def fwd(v, t, p):
            present = [x for x in (v, t, p) if x is not None]
            b = present[0].size(0)
            mus = [torch.zeros(1, b, m.latent_size)]
            lvs = [torch.zeros(1, b, m.latent_size)]
            if v is not None:
                mu, lvr = m.visual_encoder(v, cond)
                mus.append(mu[None]); lvs.append(lvr[None])
            if t is not None:
                mu, lvr = m.tactile_encoder(t, cond)
                mus.append(mu[None]); lvs.append(lvr[None])
            if p is not None:
                mu, lvr = m.pose_encoder(p)   # pose is unconditional
                mus.append(mu[None]); lvs.append(lvr[None])
            mu, lv = gold_poe(torch.cat(mus), torch.cat(lvs))
            if args.noise_free:
                z = mu
            else:
                std = torch.exp(0.5 * lv)
                z = mu + torch.randn_like(std) * std   # vae.py:52-61
            return (m.visual_decoder(z, cond), m.tactile_decoder(z, cond),
                    m.pose_decoder(z), mu, lv)

        loss = 0
        vr, tr, _, mu, lv = fwd(bv, bt, None)
        loss = loss + gold_mvae_elbo([vr, tr], [gv, gt], mu, lv, klw, 1000.0)
        vr, _, _, mu, lv = fwd(bv, None, None)
        loss = loss + gold_mvae_elbo([vr], [gv], mu, lv, klw, 1000.0)
        _, tr, _, mu, lv = fwd(None, bt, None)
        loss = loss + gold_mvae_elbo([tr], [gt], mu, lv, klw, 1000.0)
        vr, tr, pr, mu, lv = fwd(bv, bt, bp)
        loss = loss + gold_mvae_elbo([vr, tr, pr], [gv, gt, gp], mu, lv, klw, 1000.0)
        vr, _, pr, mu, lv = fwd(bv, None, bp)
        loss = loss + gold_mvae_elbo([vr, pr], [gv, gp], mu, lv, klw, 1000.0)
        _, tr, pr, mu, lv = fwd(None, bt, bp)
        loss = loss + gold_mvae_elbo([tr, pr], [gt, gp], mu, lv, klw, 1000.0)
        _, _, pr, mu, lv = fwd(None, None, bp)
        loss = loss + gold_mvae_elbo([pr], [gp], mu, lv, klw, 1000.0)
        return loss

    def batch_views(sl):
        """Per-problem (inputs, targets, condition) for one batch."""
        cond = None
        if args.problem == "seq_modeling":
            if cond_dim:
                # condition strided like the input (problems.py:664-667)
                cond = seqs["shock"][sl, 0]
            return ((seqs["visual"][sl, 0], seqs["tactile"][sl, 0],
                     seqs["pose"][sl, 0]),
                    (seqs["final_visual"][sl], seqs["final_tactile"][sl],
                     seqs["final_pose"][sl]), cond)
        if args.problem == "dyn_modeling":
            bv, gv = dyn_flatten_roll(seqs["visual"][sl],
                                      seqs["final_visual"][sl])
            bt_, gt = dyn_flatten_roll(seqs["tactile"][sl],
                                       seqs["final_tactile"][sl])
            bp = seqs["pose"][sl].reshape(-1, 7)
            # reference rolls pose targets WITHOUT the resting patch
            # (problems.py:798)
            gp = np.roll(bp, -1, axis=0)
            if cond_dim:
                cond = seqs["shock"][sl].reshape(-1, cond_dim)
            return (bv, bt_, bp), (gv, gt, gp), cond
        # regression: visual frame 0 -> final pose
        return ((seqs["visual"][sl, 0],), (seqs["final_pose"][sl],), cond)

    n = seqs["visual"].shape[0]
    nb = n // args.batch
    history = []
    for epoch in range(args.epochs):
        klw = anneal_kl(epoch, args.anneal)
        losses = []
        for b in range(nb):
            sl = slice(b * args.batch, (b + 1) * args.batch)
            ins, tgts, cond = batch_views(sl)
            opt.zero_grad()
            if is_reg:
                out = model(to_img(ins[0]))
                loss = torch.nn.functional.mse_loss(
                    out, torch.tensor(tgts[0]), reduction="sum")
            else:
                loss = mvae_eval(model, to_img(ins[0]), to_img(ins[1]),
                                 torch.tensor(ins[2]), to_img(tgts[0]),
                                 to_img(tgts[1]), torch.tensor(tgts[2]), klw,
                                 cond=None if cond is None
                                 else torch.tensor(cond))
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        history.append(float(np.mean(losses)))
        print(f"# torch epoch {epoch}: {history[-1]:.2f}", file=sys.stderr)
    return history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="seq_modeling",
                    choices=["seq_modeling", "dyn_modeling", "regression"])
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16,
                    help="sequences per step (dyn flattens to batch*T rows)")
    ap.add_argument("--n-seq", type=int, default=32)
    ap.add_argument("--seq-len", type=int, default=4,
                    help="frames per synthetic sequence (ignored with "
                    "--dataset)")
    ap.add_argument("--latent", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--anneal", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dataset", default=None,
                    help="compiled dataset path (real exp data) instead of "
                    "synthetic frames")
    ap.add_argument("--skip-torch", action="store_true",
                    help="only run the jax side (reuse a recorded torch "
                    "trajectory)")
    ap.add_argument("--out", default=None, help="also write the JSON here")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16", "bfloat16_full"],
                    help="jax-side activation policy (torch side is always "
                    "f32; use to bound the accelerated policies' drift)")
    ap.add_argument("--conditional", action="store_true",
                    help="CVAE pathway: the shock condition concatenates "
                    "into the visual/tactile encoders (after the FC trunk) "
                    "and decoders (onto z); pose stays unconditional "
                    "(problems.py:286-289, vae.py:118-123). Requires a "
                    "shock stream (exp_3 corpora, or synthetic)")
    ap.add_argument("--shock-dim", type=int, default=3,
                    help="synthetic shock width (ignored with --dataset)")
    ap.add_argument("--noise-free", action="store_true",
                    help="z = posterior mean on both sides")
    ap.add_argument("--no-dropout", action="store_true",
                    help="disable Dropout(0.1) on both sides")
    ap.add_argument("--shared-init", action="store_true",
                    help="transplant the jax init weights into torch")
    ap.add_argument("--seed", type=int, default=0,
                    help="init + noise seed for both sides")
    ap.add_argument("--seeds", default=None,
                    help="comma list: run the JAX side once per seed "
                    "(independent init + noise draws) and emit per-seed "
                    "trajectories — bounds the init-luck spread behind the "
                    "docs/PARITY.md root-cause finding; combine with "
                    "--skip-torch or let the single torch run (at --seed) "
                    "serve as the comparison point")
    args = ap.parse_args()

    if args.platform:
        import os
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platform_name", args.platform)

    if args.dataset:
        seqs = load_compiled_sequences(args.dataset, args.n_seq)
        print(f"# real dataset: {seqs['visual'].shape[0]} sequences x "
              f"{seqs['visual'].shape[1]} frames from {args.dataset}",
              file=sys.stderr)
    else:
        seqs = make_synthetic_sequences(
            args.n_seq, args.seq_len,
            shock_dim=args.shock_dim if args.conditional else 0)
    if args.conditional and "shock" not in seqs:
        raise SystemExit("--conditional needs a shock stream; this dataset "
                         "has none (use an exp_3 corpus)")

    if args.seeds is not None:
        # multi-seed spread: JAX side per seed, optional single torch anchor
        seed_list = [int(s) for s in args.seeds.split(",")]
        per_seed = {}
        for s in seed_list:
            t0 = time.time()
            per_seed[s] = run_jax(seqs, args, seed=s)
            print(f"# jax seed {s} done in {time.time()-t0:.1f}s "
                  f"(final {per_seed[s][-1]:.2f})", file=sys.stderr)
        result = {"problem": args.problem,
                  "jax_elbo_by_seed": {str(s): [round(x, 2) for x in h]
                                       for s, h in per_seed.items()}}
        finals = [h[-1] for h in per_seed.values()]
        result["jax_final_min"] = round(min(finals), 2)
        result["jax_final_max"] = round(max(finals), 2)
        if not args.skip_torch:
            t0 = time.time()
            th = run_torch(seqs, args, seed=args.seed)
            print(f"# torch done in {time.time()-t0:.1f}s", file=sys.stderr)
            result["torch_elbo"] = [round(x, 2) for x in th]
        line = json.dumps(result)
        print(line)
        if args.out:
            Path(args.out).write_text(line + "\n")
        return

    init_out = [] if args.shared_init else None
    t0 = time.time()
    jx = run_jax(seqs, args, seed=args.seed, init_params_out=init_out)
    print(f"# jax done in {time.time()-t0:.1f}s", file=sys.stderr)
    th = None
    if not args.skip_torch:
        t0 = time.time()
        th = run_torch(seqs, args, seed=args.seed,
                       init_params=init_out[0] if init_out else None)
        print(f"# torch done in {time.time()-t0:.1f}s", file=sys.stderr)

    result = {"problem": args.problem,
              "jax_elbo": [round(x, 2) for x in jx]}
    if th is not None:
        gap = abs(jx[-1] - th[-1]) / abs(th[-1]) * 100
        result = {"problem": args.problem, "final_gap_pct": round(gap, 3),
                  "jax_elbo": [round(x, 2) for x in jx],
                  "torch_elbo": [round(x, 2) for x in th]}
    line = json.dumps(result)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
