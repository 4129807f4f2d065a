"""TPU-only smoke test: exercises the paths CPU tests can't reach.

    python tools/tpu_smoke.py

Checks, on the default (TPU) backend:
  1. the Pallas fused PoE+reparam kernel compiles + runs and matches the jnp
     fallback (lane-aligned D=256);
  2. a bf16 flagship train step runs and produces a finite decreasing loss;
  3. the on-device tactile renderer compiles at 480x640.
Exits non-zero on any failure.
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() != "cpu", (
        "tpu_smoke must run on an accelerator backend; found cpu")
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    # 1. pallas kernel vs jnp fallback
    from mmdyn_tpu.ops.kernels import (_poe_reparam_jnp, _poe_reparam_pallas,
                                       _use_pallas)
    from mmdyn_tpu.problems.reconstruction import SUBSETS_POSE

    rng = np.random.default_rng(0)
    mu = jnp.asarray(rng.normal(size=(4, 64, 256)).astype(np.float32))
    lv = jnp.asarray(rng.normal(size=(4, 64, 256)).astype(np.float32))
    mask = jnp.asarray(SUBSETS_POSE)
    noise = jnp.asarray(rng.normal(size=(7, 64, 256)).astype(np.float32))
    assert _use_pallas(mu), "expected the pallas path for (4, 64, 256)"
    zp, mp, lp = _poe_reparam_pallas(mu, lv, mask, noise)
    zj, mj, lj = _poe_reparam_jnp(mu, lv, mask, noise)
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zj), rtol=2e-5,
                               atol=1e-5)
    print("1. pallas fused PoE kernel: OK (matches jnp fallback)")

    # 2. bf16 flagship train steps
    from mmdyn_tpu.models import setup_model
    from mmdyn_tpu.problems.base import ProblemConfig, make_optimizer
    from mmdyn_tpu.train.state import create_train_state
    from mmdyn_tpu.train.steps import make_train_step

    batch = 64
    cfg = ProblemConfig(problem_type="seq_modeling", model_name="cnn-mvae",
                        input_type="visuotactile", use_pose=True,
                        latent_size=256, batchsize=batch,
                        compute_dtype="bfloat16")
    model = setup_model("cnn-mvae", cross_modal=True, latent_size=256,
                        use_pose=True, compute_dtype="bfloat16")
    f32 = lambda *s: jnp.asarray(rng.uniform(size=s).astype(np.float32))
    bd = {"visual": f32(batch, 2, 64, 64, 3), "tactile": f32(batch, 2, 64, 64, 3),
          "pose": f32(batch, 2, 7), "avail": jnp.ones((batch, 2, 2), jnp.float32),
          "final_visual": f32(batch, 64, 64, 3),
          "final_tactile": f32(batch, 64, 64, 3), "final_pose": f32(batch, 7),
          "seg": jnp.ones((batch, 2, 64, 64, 3), jnp.float32)}
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    variables = model.init({"params": ks[0], "dropout": ks[1], "reparam": ks[2]},
                           [bd["visual"][:, 0], bd["tactile"][:, 0]],
                           bd["final_pose"])
    tx = make_optimizer(cfg)
    state = create_train_state(variables["params"], tx)
    step_fn = make_train_step(cfg, model, tx)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(5):
        key, sub = jax.random.split(key)
        state, m = step_fn(state, bd, sub, jnp.float32(1.0))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    print(f"2. bf16 train steps: OK (loss {losses[0]:.0f} -> {losses[-1]:.0f})")

    # 3. on-device tactile renderer
    from mmdyn_tpu.sim.physics import AnalyticBackend
    from mmdyn_tpu.sim.sensor import make_sensor
    from mmdyn_tpu.sim.tactile_jax import TactileRendererJax

    backend = AnalyticBackend()
    sensor = make_sensor(backend, size=[1.5, 1.5, 1.0], position=[0, 0, 0.5],
                         sensor_vector=[0, 0, 1], thickness=0.05)
    backend.add_sphere(0.15, [0.05, -0.1, 1.4], mass=0.5)
    for _ in range(400):
        backend.step()
    _, _, depth_clip, _, _ = sensor.get_sensor_image()
    renderer = TactileRendererJax.from_sensor(sensor)
    t0 = time.perf_counter()
    out = np.asarray(renderer(np.stack([np.asarray(depth_clip)] * 8)))
    assert out.shape == (8, 480, 640, 3) and out.dtype == np.uint8
    print(f"3. on-device tactile renderer: OK "
          f"(8 frames in {time.perf_counter()-t0:.1f}s incl compile)")
    print("TPU smoke: ALL OK")


if __name__ == "__main__":
    main()
