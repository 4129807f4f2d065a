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
    # the reference's own default batch size (main.py:25) on the headline
    # config — tracks small-batch latency, not just saturated throughput
    dict(name="cnn-mvae/vt+pose/seq@128", model_name="cnn-mvae",
         input_type="visuotactile", use_pose=True, problem_type="seq_modeling",
         batch=128),
]


def bench_config(spec, batch, steps, latent, bf16, seq_len, dtype=None):
    from bench import bench_train

    return bench_train(problem_type=spec["problem_type"],
                       model_name=spec["model_name"],
                       input_type=spec["input_type"],
                       use_pose=spec["use_pose"], batch=batch, steps=steps,
                       latent=latent, bf16=bf16, seq_len=seq_len,
                       dtype=dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--dyn-batch", type=int, default=256,
                    help="sequence batch for dyn_modeling (frames = B*T)")
    ap.add_argument("--seq-len", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--latent", type=int, default=256)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false", default=True)
    ap.add_argument("--dtype", default="auto",
                    choices=["auto", "float32", "bfloat16", "bfloat16_full"],
                    help="'auto' resolves per row by the measured batch-size "
                         "crossover (so the @128 row runs plain bfloat16)")
    args = ap.parse_args()

    print(f"{'config':26} {'batch':>6} {'ms/step':>9} {'frames/s':>12}",
          file=sys.stderr)
    for spec in CONFIGS:
        batch = spec.get("batch") or (
            args.dyn_batch if spec["problem_type"] == "dyn_modeling"
            else args.batch)
        dtype = args.dtype if args.bf16 else "float32"
        if dtype == "auto":   # resolve for the printed record
            from mmdyn_tpu.problems.base import (ProblemConfig,
                                                 select_compute_dtype)
            dtype = select_compute_dtype(
                ProblemConfig(problem_type=spec["problem_type"],
                              model_name=spec["model_name"],
                              input_type=spec["input_type"],
                              use_pose=spec["use_pose"], batchsize=batch,
                              compute_dtype="auto"), args.seq_len)
        fps, step_time, loss = bench_config(spec, batch, args.steps,
                                            args.latent, args.bf16,
                                            args.seq_len, dtype=dtype)
        print(f"{spec['name']:26} {batch:>6} {step_time*1e3:>9.2f} "
              f"{fps:>12.0f}", file=sys.stderr)
        print(json.dumps({"config": spec["name"], "batch": batch,
                          "ms_per_step": round(step_time * 1e3, 3),
                          "frames_per_sec": round(fps, 1),
                          "loss": round(loss, 1), "dtype": dtype}))


if __name__ == "__main__":
    main()
