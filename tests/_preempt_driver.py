"""Subprocess driver for the preemption tests.

Trains a tiny cnn-vae on a compiled synthetic dataset; with
``--kill-after-steps N`` the process sends ITSELF a real SIGTERM after its
N-th optimizer step, exercising the production preemption path
(train/loop.py: handler -> mid-epoch 'latest' snapshot -> clean exit). The
parent test then asserts a ``--resume`` run completes bit-identically to an
uninterrupted golden run (tests/test_train.py::TestPreemption).
"""

import argparse
import json
import os
import signal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--log-dir", required=True)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--kill-after-steps", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platform_name", "cpu")
    from mmdyn_tpu.utils.compile_cache import maybe_enable
    maybe_enable("/tmp/mmdyn_xla_cache_tests")

    from mmdyn_tpu.problems.base import ProblemConfig
    from mmdyn_tpu.train.loop import Problem

    cfg = ProblemConfig(problem_type="seq_modeling", model_name="cnn-vae",
                        input_type="visual", latent_size=8,
                        batchsize=4, num_epochs=args.epochs,
                        annealing_epochs=2)
    p = Problem(cfg, args.dataset, log_dir=args.log_dir, seed=args.seed,
                tensorboard=False, resume=args.resume)

    if args.kill_after_steps:
        orig = p.train_step
        count = [0]

        def wrapped(*a, **kw):
            out = orig(*a, **kw)
            count[0] += 1
            if count[0] == args.kill_after_steps:
                os.kill(os.getpid(), signal.SIGTERM)
            return out

        p.train_step = wrapped

    logs = p.train()
    print(json.dumps({
        "val": logs.get("Loss/validation_epoch", []),
        "train": logs.get("Loss/train_epoch", []),
        "preempted": bool(p._preempted),
    }))


if __name__ == "__main__":
    main()
