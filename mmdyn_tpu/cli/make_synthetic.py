"""Generate a synthetic dataset (sim-dump-shaped PNGs or packed arrays).

    python -m mmdyn_tpu.cli.make_synthetic --out /tmp/ds --n-sequences 8
    python -m mmdyn_tpu.cli.make_synthetic --out /tmp/ds --packed
"""

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True, type=str)
    parser.add_argument("--n-sequences", type=int, default=8)
    parser.add_argument("--seq-length", type=int, default=10)
    parser.add_argument("--with-shock", action="store_true", default=False)
    parser.add_argument("--packed", action="store_true", default=False,
                        help="Write the compiled npz directly (skip PNGs)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from pathlib import Path
    from mmdyn_tpu.data.synthetic import make_compiled_arrays, make_synthetic_dumps
    from mmdyn_tpu.data.compile import COMPILED_NAME

    if args.packed:
        out = make_compiled_arrays(Path(args.out) / COMPILED_NAME,
                                   n_sequences=args.n_sequences,
                                   seq_length=args.seq_length,
                                   with_shock=args.with_shock, seed=args.seed)
    else:
        out = make_synthetic_dumps(args.out, n_sequences=args.n_sequences,
                                   seq_length=args.seq_length,
                                   with_shock=args.with_shock, seed=args.seed)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
