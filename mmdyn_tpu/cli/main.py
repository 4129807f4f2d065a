"""Training CLI, flag-compatible with the reference (mmdyn/pytorch/main.py).

Example:
    python -m mmdyn_tpu.cli.main --problem-type seq_modeling \
        --model-name cnn-mvae --input-type visuotactile --use-pose \
        --dataset-path ~/dataset --batchsize 128 --num-epochs 100

TPU additions: --num-devices (data-parallel mesh), --resume, --seed,
--no-strict-parity, --platform.
"""

import argparse
import os
import pickle


def build_parser():
    parser = argparse.ArgumentParser(description="TPU Training")

    # Problem (reference flags, main.py:10-54)
    parser.add_argument("--problem-type", default="seq_modeling", type=str,
                        help="Problem type (default: seq_modeling)")
    parser.add_argument("--model-name", default="cnn-mvae", type=str,
                        help="Model architecture name")
    parser.add_argument("--input-type", default="visual", type=str,
                        help="Input modality (valid: visual, tactile, visuotactile)")
    parser.add_argument("--use-pose", action="store_true", default=False,
                        help="Use pose as additional modality (MVAE only)")
    parser.add_argument("--lr", default=0.001, type=float)
    parser.add_argument("--dataset-path", default="~/dataset", type=str)
    parser.add_argument("--batchsize", default=128, type=int)
    parser.add_argument("--criterion", default="crossentropy", type=str)
    parser.add_argument("--optimizer", default="Adam", type=str)
    parser.add_argument("--num-epochs", default=100, type=int)
    parser.add_argument("--mask-loss", action="store_true", default=False,
                        help="Mask the reconstruction loss to the object segment")
    parser.add_argument("--vis-pose", action="store_true", default=False)
    parser.add_argument("--pose-multiplier", default=1000, type=float)

    # Misc
    parser.add_argument("--save-name", default="run", type=str)
    parser.add_argument("--no-cuda", action="store_true", default=False,
                        help="(accepted for compatibility; device selection is"
                             " via --platform on this framework)")

    # VAE specific
    parser.add_argument("--kl-weight", type=float, default=1.0)
    parser.add_argument("--latent-size", type=int, default=256)
    parser.add_argument("--annealing-epochs", type=int, default=50)
    parser.add_argument("--conditional", action="store_true", default=False)

    # TPU framework additions
    parser.add_argument("--num-devices", type=int, default=0,
                        help="Data-parallel over this many devices (0 = single)")
    parser.add_argument("--resume", action="store_true", default=False)
    parser.add_argument("--log-dir", default=None, type=str,
                        help="Reuse an existing run directory (for --resume)")
    parser.add_argument("--logs-root", default="./logs", type=str)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-strict-parity", action="store_true", default=False,
                        help="Disable replication of reference dataset quirks")
    parser.add_argument("--no-crop", action="store_true", default=False,
                        help="Compile/train WITHOUT the reference's seg-bbox "
                             "re-crop (datasets.py:347-366). Beyond-parity: "
                             "keeps the full camera frame so world x/y stays "
                             "observable (the crop centres the object in "
                             "every frame, making x/y unlearnable)")
    parser.add_argument("--no-tensorboard", action="store_true", default=False)
    parser.add_argument("--platform", default=None, type=str,
                        help="Force a JAX platform (e.g. cpu)")
    parser.add_argument("--dtype", default="auto", type=str,
                        choices=("auto", "float32", "bfloat16",
                                 "bfloat16_full"),
                        help="Activation policy. 'auto' (default) picks the "
                             "measured-fastest: bfloat16 below ~512 model "
                             "rows/step, bfloat16_full at/above (the "
                             "crossover where the byte savings start paying "
                             "for the converts — docs/PARITY.md)")
    parser.add_argument("--bf16", action="store_true", default=False,
                        help="bfloat16 matmul/conv inputs (f32 accumulate); "
                             "overrides --dtype")
    parser.add_argument("--bf16-full", action="store_true", default=False,
                        help="bfloat16 activations end-to-end (halves HBM "
                             "traffic; stats/latent/loss math stay f32); "
                             "overrides --dtype")
    parser.add_argument("--profile-dir", default=None, type=str,
                        help="Capture a jax.profiler trace of epoch 1 here")
    parser.add_argument("--remat", action="store_true", default=False,
                        help="Rematerialise activations in the backward pass")
    parser.add_argument("--augment", action="store_true", default=False,
                        help="On-device train-time augmentation (flip/shift/"
                             "brightness; image-only problems)")
    parser.add_argument("--augment-shift", type=int, default=4,
                        help="Max translation in pixels for --augment")
    parser.add_argument("--augment-brightness", type=float, default=0.1,
                        help="Max relative brightness jitter for --augment")
    parser.add_argument("--image-interval", type=int, default=1,
                        help="Log sample/recon image grids every N epochs "
                             "(1 = reference behaviour)")
    parser.add_argument("--ckpt-interval", type=int, default=1,
                        help="Write the 'latest' resume checkpoint every N "
                             "epochs (best-val saves are unaffected)")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platform_name", args.platform)
    from mmdyn_tpu.utils.compile_cache import maybe_enable
    maybe_enable()

    from mmdyn_tpu import config
    from mmdyn_tpu.parallel.mesh import make_mesh
    from mmdyn_tpu.problems.base import ProblemConfig
    from mmdyn_tpu.train.loop import Problem

    assert args.problem_type in config.PROBLEM_TYPES, "Invalid problem type."

    cfg = ProblemConfig(
        problem_type=args.problem_type,
        model_name=args.model_name,
        input_type=args.input_type,
        use_pose=args.use_pose,
        conditional=args.conditional,
        mask_loss=args.mask_loss,
        kl_weight=args.kl_weight,
        pose_multiplier=args.pose_multiplier,
        latent_size=args.latent_size,
        annealing_epochs=args.annealing_epochs,
        lr=args.lr,
        optimizer=args.optimizer,
        batchsize=args.batchsize,
        num_epochs=args.num_epochs,
        compute_dtype=("bfloat16_full" if args.bf16_full
                       else "bfloat16" if args.bf16 else args.dtype),
        remat=args.remat,
        augment=args.augment,
        augment_shift=args.augment_shift,
        augment_brightness=args.augment_brightness,
    )
    mesh = make_mesh(args.num_devices) if args.num_devices else None

    problem = Problem(cfg, args.dataset_path, save_name=args.save_name,
                      logs_root=args.logs_root, log_dir=args.log_dir,
                      seed=args.seed, mesh=mesh,
                      tensorboard=not args.no_tensorboard,
                      strict_parity=not args.no_strict_parity,
                      no_crop=args.no_crop,
                      resume=args.resume, profile_dir=args.profile_dir,
                      image_interval=args.image_interval,
                      ckpt_interval=args.ckpt_interval,
                      vis_pose=args.vis_pose)

    # reference saves the argparse namespace next to the run (main.py:69)
    with open(problem.log_dir / "problem.pkl", "wb") as f:
        pickle.dump(vars(args), f)

    problem.train()
    return problem


if __name__ == "__main__":
    main()
