"""Counterfactual sweep for conditional (CVAE) models: one observation,
many shock conditions.

The exp_3 pathway trains resting-state prediction conditioned on the shock
force (/root/reference/mmdyn/pytorch/problems/problems.py:664-667 +
models/vae.py:231-237); the reference never exposes a way to ASK the model
"what if the push were different?". This sweeps the condition over a grid
for a fixed input frame and reports how the predicted resting state moves —
the conditional-generative capability the paper motivates.

    python tools/counterfactual.py --run logs/cvae_run/ \
        --frames ds/dataset/.../sequence_0 --sweep 0,0.25,0.5,0.75,1 \
        --strip counterfactual.png

Outputs one JSON line: per-condition masked L1 of the prediction vs the
zero-condition prediction (sensitivity), plus an optional PNG strip (one
row per condition value).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_parser():
    p = argparse.ArgumentParser(description="Conditional counterfactual sweep")
    p.add_argument("--run", required=True, type=str)
    p.add_argument("--frames", required=True, type=str,
                   help="sequence dump dir; frame --index is the observation")
    p.add_argument("--index", default=0, type=int)
    p.add_argument("--sweep", default="0,0.25,0.5,0.75,1", type=str,
                   help="normalized condition values (applied to every dim)")
    p.add_argument("--strip", default=None, type=str)
    p.add_argument("--out", default=None, type=str)
    p.add_argument("--calibrate", default=None, type=str)
    p.add_argument("--platform", default=None, type=str)
    return p


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
    import numpy as np

    from mmdyn_tpu.cli.infer import _load_frames
    from mmdyn_tpu.serve import InferenceSession

    session = InferenceSession.from_run(args.run)
    cfg = session.cfg
    if not cfg.conditional:
        raise SystemExit("--run must be a conditional (CVAE) model")
    modalities = (("visual", "tactile") if cfg.cross_modal
                  else (cfg.input_type,))
    if args.calibrate:
        cal = _load_frames(args.calibrate, modalities)
        n_cal = len(next(iter(cal.values())))
        session = session.freeze_bn(
            **cal, condition=np.zeros((n_cal, cfg.condition_dim), np.float32))

    frames = _load_frames(args.frames, modalities)
    obs = {m: v[args.index:args.index + 1] for m, v in frames.items()}
    values = [float(x) for x in args.sweep.split(",")]

    preds = {}
    for val in values:
        cond = np.full((1, cfg.condition_dim), val, np.float32)
        out = session.predict(**obs, condition=cond)
        preds[val] = {m: np.asarray(out[m])[0] for m in modalities}
        preds[val]["mu"] = np.asarray(out["mu"])[0]

    base = preds[values[0]]
    report = {"run": str(args.run), "frames": str(args.frames),
              "index": args.index, "condition_dim": cfg.condition_dim,
              "sweep": values, "vs": values[0]}
    for m in modalities:
        report[f"{m}_l1_vs_base"] = [
            round(float(np.abs(preds[v][m] - base[m]).mean()), 5)
            for v in values]
    report["mu_l2_vs_base"] = [
        round(float(np.linalg.norm(preds[v]["mu"] - base["mu"])), 4)
        for v in values]
    # the conditional pathway is live iff non-base conditions move the output
    deltas = [x for v in values[1:]
              for x in [report[f"{modalities[0]}_l1_vs_base"][values.index(v)]]]
    report["condition_sensitivity"] = round(float(np.mean(deltas)), 5)

    if args.strip:
        from PIL import Image

        rows = []
        for v in values:
            rows.append(np.concatenate([preds[v][m] for m in modalities],
                                       axis=1))
        strip = np.concatenate(rows, axis=0)
        Image.fromarray((np.clip(strip, 0, 1) * 255).astype(np.uint8)).save(
            args.strip)
        report["strip"] = str(args.strip)

    line = json.dumps(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)
    return report


if __name__ == "__main__":
    main()
