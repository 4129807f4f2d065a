"""Export an mmdyn_tpu checkpoint to the reference's torch .ckpt format
(torch.save({'model': state_dict, 'loss': ..., 'epoch': ...}) as in
problems.py:580-586), or import one back.

    # export the best checkpoint of a run
    python tools/export_torch_ckpt.py export --run logs/run_.../ \
        --model-name cnn-mvae --out epoch_N.ckpt

    # import a reference checkpoint into a packed flax params file
    python tools/export_torch_ckpt.py import --ckpt epoch_5.ckpt \
        --model-name cnn-mvae --out params.msgpack
"""

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# checkpoint conversion never needs an accelerator; pin CPU (the axon plugin
# ignores JAX_PLATFORMS alone, so also set the platform name after import)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")


def cmd_export(args):
    import numpy as np
    import torch
    from flax import serialization
    from mmdyn_tpu.train.checkpoint import latest_checkpoint
    from mmdyn_tpu.utils.torch_compat import to_torch_state_dict
    import orbax.checkpoint as ocp

    ckpt_dir = Path(args.run) / "checkpoint"
    path = latest_checkpoint(ckpt_dir)
    assert path is not None, f"no checkpoint under {ckpt_dir}"
    # restore as host numpy so checkpoints written on any device topology
    # (CPU mesh, TPU) export identically
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path.absolute()).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    restored = ckptr.restore(path.absolute(), restore_args=restore_args)
    params = restored["state"]["params"]
    epoch = int(np.asarray(restored["epoch"]))
    best_loss = float(np.asarray(restored["best_loss"]))

    sd = to_torch_state_dict(args.model_name,
                             jax.tree_util.tree_map(np.asarray, params))
    torch_sd = {k: torch.tensor(np.ascontiguousarray(v)) for k, v in sd.items()}
    torch.save({"model": torch_sd, "loss": best_loss, "epoch": epoch}, args.out)
    print(f"exported {len(torch_sd)} tensors (epoch {epoch}, "
          f"loss {best_loss:.3f}) -> {args.out}")


def cmd_import(args):
    import numpy as np
    import torch
    from flax import serialization
    from mmdyn_tpu.utils.torch_compat import from_torch_state_dict

    blob = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = blob["model"] if isinstance(blob, dict) and "model" in blob else blob
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    params = from_torch_state_dict(args.model_name, sd)
    with open(args.out, "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    print(f"imported {len(sd)} tensors -> {args.out} "
          f"(flax msgpack; load with flax.serialization.msgpack_restore)")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("export")
    e.add_argument("--run", required=True, help="run directory (with checkpoint/)")
    e.add_argument("--model-name", required=True)
    e.add_argument("--out", required=True)
    i = sub.add_parser("import")
    i.add_argument("--ckpt", required=True)
    i.add_argument("--model-name", required=True)
    i.add_argument("--out", required=True)
    args = ap.parse_args()
    (cmd_export if args.cmd == "export" else cmd_import)(args)


if __name__ == "__main__":
    main()
