"""Static per-instruction byte census of the compiled train step.

Lowers the bench train step, compiles it, and parses the optimized HLO text
to attribute (operand + output) bytes per instruction, aggregated by opcode
and listing the largest individual ops. HLO 'bytes accessed' totals hide
where the traffic is; this recovers the breakdown without a profiler UI.

    python tools/hlo_bytes.py --problem dyn_modeling --batch 256 --seq-len 8
"""

import argparse
import re
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "u8": 1,
               "s8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8, "c64": 8}

SHAPE_RE = re.compile(r"\b(f32|bf16|f16|f64|s8|s32|s64|u8|u32|u64|pred|c64)\[([0-9,]*)\]")


def shape_bytes(text):
    """Sum the byte sizes of every shape literal in an HLO type signature."""
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="dyn_modeling")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seq-len", type=int, default=8)
    ap.add_argument("--latent", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16_full")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    from bench import build_train_setup

    cfg, model, state, tx, step_fn, data = build_train_setup(
        problem_type=args.problem, batch=args.batch, latent=args.latent,
        compute_dtype=args.dtype, seq_len=args.seq_len)
    key = jax.random.PRNGKey(1)
    import jax.numpy as jnp
    compiled = step_fn.lower(state, data, key, jnp.float32(1.0)).compile()
    hlo = compiled.as_text()

    # instruction lines look like:  %name = f32[...]{...} opcode(f32[...] %a, ...)
    inst_re = re.compile(
        r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(\(?.*?\)?\{?[^=]*?)\s+([\w\-]+)\((.*)\)",
    )
    by_opcode = defaultdict(lambda: [0, 0])
    biggest = []
    in_entry = False
    for line in hlo.splitlines():
        # only the ENTRY computation's instructions touch HBM; fusion bodies
        # execute in registers/VMEM
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if not in_entry:
            continue
        m = inst_re.match(line)
        if not m:
            continue
        name, out_sig, opcode, operands = m.groups()
        if opcode in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast"):
            continue
        total = shape_bytes(out_sig) + shape_bytes(operands)
        by_opcode[opcode][0] += total
        by_opcode[opcode][1] += 1
        biggest.append((total, opcode, name, out_sig[:80]))

    print(f"# {args.problem} batch={args.batch} seq={args.seq_len} "
          f"dtype={args.dtype}")
    print("== bytes by opcode ==")
    for op, (b, n) in sorted(by_opcode.items(), key=lambda kv: -kv[1][0])[:20]:
        print(f"  {op:<28} {b/1e9:8.2f} GB  ({n} ops)")
    print("== largest instructions ==")
    for b, op, name, sig in sorted(biggest, reverse=True)[:args.top]:
        print(f"  {b/1e9:7.2f} GB  {op:<20} {name:<40} {sig}")
    total = sum(b for b, _ in by_opcode.values())
    print(f"total: {total/1e9:.1f} GB (cost_analysis said "
          f"{float((compiled.cost_analysis()[0] if isinstance(compiled.cost_analysis(), list) else compiled.cost_analysis()).get('bytes accessed', 0))/1e9:.1f})")


if __name__ == "__main__":
    main()
