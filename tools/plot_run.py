"""Render a training run's ELBO curves from its metrics.jsonl.

    python tools/plot_run.py --run <logdir> --out docs/convergence/run.png

Reads the MetricWriter JSONL (train/validation epoch losses + frames/sec) and
writes a two-series line chart plus a machine-readable summary JSON next to
it. Chart styling follows the repo-external dataviz method: categorical slots
1/2 (blue #2a78d6 / orange #eb6834 — a validated adjacent pair), 2px lines,
recessive grid, direct labels + legend, text in ink tokens not series colors.
"""

import argparse
import json
from collections import defaultdict
from pathlib import Path

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
SERIES = {"train": "#2a78d6", "validation": "#eb6834"}


def load_metrics(run_dir):
    path = Path(run_dir)
    jsonl = path / "tensorboard" / "metrics.jsonl"
    if not jsonl.exists():
        jsonl = path / "metrics.jsonl"
    series = defaultdict(dict)
    with open(jsonl) as f:
        for line in f:
            rec = json.loads(line)
            if "value" in rec:
                series[rec["tag"]][rec["step"]] = rec["value"]
    return {k: [v[s] for s in sorted(v)] for k, v in series.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--title", default="cnn-mvae seq_modeling, reference "
                    "defaults (latent 256, batch 128, KL-anneal 50)")
    args = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = load_metrics(args.run)
    train = m.get("Loss/train_epoch", [])
    val = m.get("Loss/validation_epoch", [])
    if val and not any(val):
        val = []          # empty test loader (batch > split): no curve
    assert train, f"no Loss/train_epoch records in {args.run}"
    epochs = list(range(len(train)))

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=144)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    ax.plot(epochs, train, color=SERIES["train"], lw=2, label="train")
    if val and len(val) == len(train):
        ax.plot(epochs, val, color=SERIES["validation"], lw=2,
                label="validation")
    # direct labels at the line ends (selective, not every point)
    ax.annotate(f"train {train[-1]:,.0f}", (epochs[-1], train[-1]),
                xytext=(6, 0), textcoords="offset points", color=INK,
                fontsize=9, va="center")
    if val and len(val) == len(train):
        ax.annotate(f"val {val[-1]:,.0f}", (epochs[-1], val[-1]),
                    xytext=(6, -12), textcoords="offset points", color=INK,
                    fontsize=9, va="center")

    ax.set_title(args.title, color=INK, fontsize=11, loc="left")
    ax.set_xlabel("epoch", color=INK_2, fontsize=9)
    ax.set_ylabel("ELBO loss (sum / batch)", color=INK_2, fontsize=9)
    ax.tick_params(colors=INK_2, labelsize=8)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#d8d7d2")
    ax.grid(True, color="#e8e7e2", lw=0.6)
    ax.set_axisbelow(True)
    ax.margins(x=0.02)
    leg = ax.legend(frameon=False, fontsize=9, labelcolor=INK)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE, bbox_inches="tight")
    print(f"wrote {out}")

    summary = {
        "epochs": len(train),
        "train_first": round(train[0], 2), "train_last": round(train[-1], 2),
        "train_min": round(min(train), 2),
        "monotone_after_warmup": all(b <= a * 1.02 for a, b in
                                     zip(train[3:], train[4:])),
    }
    if val:
        summary.update({"val_first": round(val[0], 2),
                        "val_last": round(val[-1], 2),
                        "val_min": round(min(val), 2)})
    fps = m.get("Perf/frames_per_sec")
    if fps:
        summary["median_frames_per_sec"] = round(sorted(fps)[len(fps) // 2], 1)
    out.with_suffix(".json").write_text(json.dumps(summary, indent=1) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
