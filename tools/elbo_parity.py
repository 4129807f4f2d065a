"""ELBO-parity harness: train mmdyn_tpu and a reference-semantics PyTorch
implementation side by side on the SAME data and compare ELBO trajectories.

The torch model is the golden reimplementation used by the parity tests
(tests/torch_reference.py) — same architecture, same sequential subset-pass
evaluation as the reference problems.py. Both sides use Adam(lr), the same
KL-annealing schedule, the same batches in the same order, and fresh noise.
Since the two frameworks draw different random numbers, trajectories are
compared statistically: per-epoch mean train ELBO, with the final-epoch
relative gap as the headline number (BASELINE.md target: within 1%).

    python tools/elbo_parity.py --epochs 5 --batch 16 --n-seq 32 --latent 64

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


def make_data(n_seq, batch, seed=0):
    """Synthetic dataset: visuotactile+pose frames in [0,1]; autoencoding
    targets (= inputs)."""
    rng = np.random.default_rng(seed)
    xv = rng.uniform(size=(n_seq, 64, 64, 3)).astype(np.float32)
    xt = rng.uniform(size=(n_seq, 64, 64, 3)).astype(np.float32)
    xp = rng.uniform(size=(n_seq, 7)).astype(np.float32)
    return (xv, xt, xp), (xv, xt, xp)


def make_data_from_compiled(path, n_seq=None):
    """Real compiled dataset -> the reference seq_modeling view: input =
    frame 0 of each sequence, target = the resting frame (problems.py:648-655
    [::seq_length] stride on the flattened batch picks exactly frame 0; the
    per-frame targets are all the resting frame)."""
    from mmdyn_tpu.data.compile import COMPILED_NAME, load_packed

    p = Path(path)
    if p.is_dir() and not (p / "visual.npy").exists():
        p = p / COMPILED_NAME
    d = load_packed(p)
    n = d["visual"].shape[0] if n_seq is None else min(n_seq,
                                                       d["visual"].shape[0])
    to_f = lambda a: (np.asarray(a, np.float32) / 255.0
                      if a.dtype == np.uint8 else np.asarray(a, np.float32))
    inputs = (to_f(d["visual"][:n, 0]), to_f(d["tactile"][:n, 0]),
              np.asarray(d["pose"][:n, 0], np.float32))
    targets = (to_f(d["final_visual"][:n]), to_f(d["final_tactile"][:n]),
               np.asarray(d["final_pose"][:n], np.float32))
    return inputs, targets


def run_jax(inputs, targets, epochs, batch, latent, lr, anneal, seed=0,
            dtype="float32"):
    xv, xt, xp = inputs
    yv, yt, yp = targets
    import jax
    import jax.numpy as jnp
    import optax
    from mmdyn_tpu.models import setup_model
    from mmdyn_tpu.problems.base import ProblemConfig, anneal_kl
    from mmdyn_tpu.problems.reconstruction import mvae_evaluate
    from mmdyn_tpu.train.state import create_train_state

    cfg = ProblemConfig(problem_type="seq_modeling", model_name="cnn-mvae",
                        input_type="visuotactile", use_pose=True,
                        latent_size=latent, batchsize=batch, lr=lr,
                        annealing_epochs=anneal, compute_dtype=dtype)
    model = setup_model("cnn-mvae", cross_modal=True, latent_size=latent,
                        use_pose=True, compute_dtype=dtype)
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    variables = model.init(
        {"params": ks[0], "dropout": ks[1], "reparam": ks[2]},
        [jnp.asarray(xv[:2]), jnp.asarray(xt[:2])], jnp.asarray(xp[:2]))
    tx = optax.adam(lr)
    state = create_train_state(variables["params"], tx)

    @jax.jit
    def step(state, bv, bt, bp, tv, tt, tp, key, klw):
        def loss_fn(params):
            ins = {"visual": bv, "tactile": bt, "pose": bp}
            tgts = {"visual": tv, "tactile": tt, "pose": tp}
            loss, _ = mvae_evaluate(model, {"params": params}, key, ins,
                                    tgts, klw, cfg)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    n = xv.shape[0]
    nb = n // batch
    key = jax.random.PRNGKey(seed + 1)
    history = []
    for epoch in range(epochs):
        klw = jnp.float32(anneal_kl(epoch, anneal))
        losses = []
        for b in range(nb):
            sl = slice(b * batch, (b + 1) * batch)
            key, sub = jax.random.split(key)
            state, loss = step(state, jnp.asarray(xv[sl]), jnp.asarray(xt[sl]),
                               jnp.asarray(xp[sl]), jnp.asarray(yv[sl]),
                               jnp.asarray(yt[sl]), jnp.asarray(yp[sl]),
                               sub, klw)
            losses.append(float(loss))
        history.append(float(np.mean(losses)))
        print(f"# jax epoch {epoch}: {history[-1]:.1f}", file=sys.stderr)
    return history


def run_torch(inputs, targets, epochs, batch, latent, lr, anneal, seed=0):
    import torch
    from tests.torch_reference import GoldMVAE, gold_mvae_evaluate
    from mmdyn_tpu.problems.base import anneal_kl

    xv, xt, xp = inputs
    yv, yt, yp = targets
    torch.manual_seed(seed)
    model = GoldMVAE(latent_size=latent, use_pose=True)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=lr)

    def evaluate_with_noise(m, bv, bt, bp, gv, gt, gp, klw):
        # replicate gold_mvae_evaluate but with z ~ N(mu, sigma)
        from tests.torch_reference import gold_poe, gold_mvae_elbo

        def fwd(v, t, p):
            present = [x for x in (v, t, p) if x is not None]
            b = present[0].size(0)
            mus = [torch.zeros(1, b, m.latent_size)]
            lvs = [torch.zeros(1, b, m.latent_size)]
            if v is not None:
                mu, lvr = m.visual_encoder(v)
                mus.append(mu[None]); lvs.append(lvr[None])
            if t is not None:
                mu, lvr = m.tactile_encoder(t)
                mus.append(mu[None]); lvs.append(lvr[None])
            if p is not None:
                mu, lvr = m.pose_encoder(p)
                mus.append(mu[None]); lvs.append(lvr[None])
            mu, lv = gold_poe(torch.cat(mus), torch.cat(lvs))
            std = torch.exp(0.5 * lv)
            z = mu + torch.randn_like(std) * std   # vae.py:52-61
            return (m.visual_decoder(z), m.tactile_decoder(z),
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

    n = xv.shape[0]
    nb = n // batch
    to_t = lambda a: torch.tensor(a.transpose(0, 3, 1, 2)) if a.ndim == 4 \
        else torch.tensor(a)
    tv, tt, tp = to_t(xv), to_t(xt), to_t(xp)
    gv_all, gt_all, gp_all = to_t(yv), to_t(yt), to_t(yp)
    history = []
    for epoch in range(epochs):
        klw = anneal_kl(epoch, anneal)
        losses = []
        for b in range(nb):
            sl = slice(b * batch, (b + 1) * batch)
            opt.zero_grad()
            loss = evaluate_with_noise(model, tv[sl], tt[sl], tp[sl],
                                       gv_all[sl], gt_all[sl], gp_all[sl], klw)
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        history.append(float(np.mean(losses)))
        print(f"# torch epoch {epoch}: {history[-1]:.1f}", file=sys.stderr)
    return history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-seq", type=int, default=32)
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
    args = ap.parse_args()

    if args.platform:
        import os
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platform_name", args.platform)

    if args.dataset:
        inputs, targets = make_data_from_compiled(args.dataset, args.n_seq)
        print(f"# real dataset: {inputs[0].shape[0]} sequences from "
              f"{args.dataset}", file=sys.stderr)
    else:
        inputs, targets = make_data(args.n_seq, args.batch)
    t0 = time.time()
    jx = run_jax(inputs, targets, args.epochs, args.batch, args.latent,
                 args.lr, args.anneal, dtype=args.dtype)
    print(f"# jax done in {time.time()-t0:.1f}s: {[round(x,1) for x in jx]}",
          file=sys.stderr)
    th = None
    if not args.skip_torch:
        t0 = time.time()
        th = run_torch(inputs, targets, args.epochs, args.batch, args.latent,
                       args.lr, args.anneal)
        print(f"# torch done in {time.time()-t0:.1f}s", file=sys.stderr)

    result = {"jax_elbo": [round(x, 2) for x in jx]}
    if th is not None:
        gap = abs(jx[-1] - th[-1]) / abs(th[-1]) * 100
        result = {"final_gap_pct": round(gap, 3),
                  "jax_elbo": [round(x, 2) for x in jx],
                  "torch_elbo": [round(x, 2) for x in th]}
    line = json.dumps(result)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
