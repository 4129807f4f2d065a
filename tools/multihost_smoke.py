"""Real multi-process (multi-host) integration smoke test, on localhost CPU.

The per-shard content tests (tests/test_train.py::TestMultiHostLoader) verify
the loader's process-local block layout against a simulated process grid in
ONE process. This tool closes the remaining gap: it actually runs
``jax.distributed.initialize`` across N OS processes (localhost coordinator,
gloo CPU collectives), builds the global batch from per-process shards via
``data.loader.to_device_batch`` / ``jax.make_array_from_process_local_data``,
executes a jitted DP train step over the multi-process 'data' mesh, and
checks the per-step losses against a single-process golden run of the same
global computation — bitwise-meaningful agreement (<=1e-5 relative).

    python tools/multihost_smoke.py --spawn 2        # parent: golden + spawn
    # (children are launched with --process-id i internally)

Exit 0 and one JSON line {"ok": true, ...} on the parent when every process
agrees with the golden trajectory. Designed to stay tiny (MLP model, 8x8
inputs): the point is the loader/mesh/collective plumbing, not the model.

Reference capability match: the reference trains single-process only
(mmdyn/pytorch/main.py); multi-host input is a new capability claimed by
parallel/mesh.py and this tool is its end-to-end evidence.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

GLOBAL_BATCH = 8
N_SEQ = 24
STEPS = 6          # 2 epochs x 3 batches
FEATURES = 64      # 8x8 flattened
LOCAL_DEVICES = 2  # per process


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def make_data():
    """Deterministic synthetic corpus — identical on every process."""
    rng = np.random.default_rng(1234)
    return {
        "x": rng.uniform(size=(N_SEQ, FEATURES)).astype(np.float32),
        "y": rng.uniform(size=(N_SEQ, 7)).astype(np.float32),
    }


def run_training(process_index, process_count, sharding=None):
    """The shared computation: seeded-shuffle loader -> device batches ->
    jitted DP step. Returns the per-step loss list."""
    import jax
    import jax.numpy as jnp
    from mmdyn_tpu.data.loader import BatchLoader, to_device_batch

    data = make_data()

    def init_params():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        w1 = jax.random.normal(k1, (FEATURES, 32)) * 0.1
        w2 = jax.random.normal(k2, (32, 7)) * 0.1
        return {"w1": w1, "w2": w2}

    @jax.jit
    def step(params, batch):
        def loss_fn(p):
            h = jnp.tanh(batch["x"] @ p["w1"])
            out = h @ p["w2"]
            return jnp.mean((out - batch["y"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params = jax.tree_util.tree_map(lambda p, g: p - 0.5 * g,
                                        params, grads)
        return params, loss

    params = init_params()
    losses = []
    for epoch in range(2):
        loader = BatchLoader(data, GLOBAL_BATCH, shuffle=True, seed=epoch,
                             process_index=(process_index
                                            if process_count > 1 else None),
                             process_count=(process_count
                                            if process_count > 1 else None))
        for host_batch in loader:
            batch = to_device_batch(host_batch, sharding=sharding)
            params, loss = step(params, batch)
            losses.append(float(loss))
    return losses


def child_main(args):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}")
    import jax

    jax.config.update("jax_platform_name", "cpu")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == args.num_processes
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    losses = run_training(jax.process_index(), jax.process_count(), sharding)
    print(json.dumps({"process": jax.process_index(), "losses": losses}))


def parent_main(args):
    # golden: the same computation, one process, no sharding
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    golden_src = (
        "import sys, json; sys.path.insert(0, %r); "
        "import jax; jax.config.update('jax_platform_name', 'cpu'); "
        "from tools.multihost_smoke import run_training; "
        "print(json.dumps(run_training(0, 1)))" % str(REPO))
    golden = json.loads(subprocess.run(
        [sys.executable, "-c", golden_src], env=env, capture_output=True,
        text=True, check=True).stdout.strip().splitlines()[-1])

    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    procs = []
    for pid in range(args.spawn):
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--process-id", str(pid),
             "--num-processes", str(args.spawn),
             "--coordinator", coordinator],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    deadline = time.time() + args.timeout
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=max(5.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        outs.append((p.returncode, out, err))

    ok = True
    report = {"num_processes": args.spawn, "golden": golden}
    for i, (rc, out, err) in enumerate(outs):
        if rc != 0:
            ok = False
            report[f"process_{i}_error"] = err.strip().splitlines()[-3:]
            continue
        child = json.loads(out.strip().splitlines()[-1])
        report[f"process_{i}"] = child["losses"]
        rel = max(abs(a - b) / max(abs(b), 1e-9)
                  for a, b in zip(child["losses"], golden))
        report[f"process_{i}_max_rel_gap"] = rel
        if len(child["losses"]) != len(golden) or rel > 1e-5:
            ok = False
    report["ok"] = ok
    print(json.dumps(report))
    sys.exit(0 if ok else 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spawn", type=int, default=0,
                    help="parent mode: run golden + spawn N child processes")
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--timeout", type=float, default=300.0)
    args = ap.parse_args()
    if args.spawn:
        parent_main(args)
    else:
        assert args.process_id is not None and args.coordinator
        child_main(args)


if __name__ == "__main__":
    main()
