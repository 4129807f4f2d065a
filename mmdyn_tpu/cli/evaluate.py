"""Offline evaluation of a trained run: test-set metrics, reconstruction
grids, and prior-sample panels written to the run's plot dir.

The reference can only reattach a run for manual analysis
(Problem(log_dir=...), problems.py:68-71); this provides the full offline
loop the reference lacks:

    python -m mmdyn_tpu.cli.evaluate --run logs/run_.../ --dataset-path ds
"""

import argparse
import json
from pathlib import Path


def build_parser():
    p = argparse.ArgumentParser(description="Evaluate a trained run")
    p.add_argument("--run", required=True, type=str,
                   help="run directory (contains checkpoint/ and problem.pkl)")
    p.add_argument("--dataset-path", default=None, type=str,
                   help="dataset to evaluate on (default: the training one)")
    p.add_argument("--batchsize", default=None, type=int)
    p.add_argument("--n-samples", default=50, type=int)
    p.add_argument("--platform", default=None, type=str)
    p.add_argument("--seed", default=0, type=int)
    return p


def _save_grid(path, images, nrow=8):
    """Write an (N, H, W, 3) float [0,1] panel as a PNG."""
    import numpy as np
    from PIL import Image
    from mmdyn_tpu.train.metrics import make_grid

    grid = make_grid(np.clip(np.asarray(images), 0, 1), nrow=nrow)
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)


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
    import numpy as np

    from mmdyn_tpu.train.loop import Problem
    from mmdyn_tpu.utils.runs import config_from_args, load_run_args

    run_dir = Path(args.run)
    saved = load_run_args(run_dir)
    cfg = config_from_args(saved, batchsize=args.batchsize)
    dataset_path = args.dataset_path or saved["dataset_path"]

    problem = Problem(cfg, dataset_path, log_dir=str(run_dir), seed=args.seed,
                      tensorboard=False, resume=True,
                      no_crop=bool(saved.get("no_crop", False)))
    assert problem._start_epoch > 0, f"no checkpoint found under {run_dir}"

    # --- test metrics ------------------------------------------------------
    kl_weight = 1.0
    val_loss, aux = problem._test_epoch(epoch=0, kl_weight=kl_weight)
    n_batches = max(len(problem.test_loader), 1)
    metrics = {"test_loss_total": val_loss,
               "test_loss_per_batch": val_loss / n_batches,
               "n_test_batches": len(problem.test_loader),
               "epoch": problem._start_epoch - 1}
    for k, v in problem._logger_dict.items():
        if v:
            metrics[k.replace("/", "_")] = float(v[-1])

    plot_dir = problem.plot_dir
    with open(plot_dir / "eval_metrics.json", "w") as f:
        json.dump(metrics, f, indent=2)

    # --- reconstruction grids ----------------------------------------------
    if aux is not None and "recon_x" in aux:
        recon = aux["recon_x"]
        sig = jax.nn.sigmoid
        if isinstance(recon, dict):
            for k, v in recon.items():
                arr = np.asarray(sig(v)) if np.asarray(v).ndim == 4 else None
                if arr is not None:
                    _save_grid(plot_dir / f"recon_{k}.png", arr[:64])
        else:
            arr = np.asarray(sig(recon))
            if arr.ndim == 4:
                _save_grid(plot_dir / "recon.png", arr[:64])

    # --- prior samples -------------------------------------------------------
    if problem.sample_fn is not None:
        # build a sampler sized to --n-samples (problem.sample_fn is jitted
        # with the training default n=50, which a conditional batch must match)
        from mmdyn_tpu.train.steps import make_sample_fn
        sample_fn = make_sample_fn(problem.cfg, problem.model,
                                   n=args.n_samples)
        cond = None
        if cfg.conditional:
            cond = jax.random.uniform(jax.random.PRNGKey(args.seed + 1),
                                      (args.n_samples, problem.cfg.condition_dim))
        samples = sample_fn(problem.state.params,
                            jax.random.PRNGKey(args.seed), cond)
        for k, v in samples.items():
            arr = np.asarray(v)
            if arr.ndim == 4:
                _save_grid(plot_dir / f"samples_{k}.png", arr)

    print(json.dumps(metrics))
    print(f"wrote evaluation artifacts to {plot_dir}")
    return metrics


if __name__ == "__main__":
    main()
