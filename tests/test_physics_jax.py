"""sim/physics_jax parity vs the float64 host engine (AnalyticBackend).

The device stepper must reproduce host trajectories at bullet_diff-style
tolerances: same contact events, same resting poses, small float32
integration drift. Scenes mirror the experiment CLIs (exp_1 fixed sensor +
falling object, exp_3 movable sensor + shock forces).
"""

import json

import numpy as np
import pytest

from mmdyn_tpu.sim import config
from mmdyn_tpu.sim.physics import AnalyticBackend
from mmdyn_tpu.sim.physics_jax import pack_scene


def _exp1_backend(obj="sphere", orientation=(0, 0, 0, 1), sensor_mass=10000,
                  obj_pos=(0.0, 0.0, 1.5)):
    b = AnalyticBackend(time_step=config.TIME_STEP)
    b.add_box([0.75, 0.75, 0.5], [0, 0, 0.5], mass=sensor_mass,
              color=(1, 0.6, 0), fixed=sensor_mass >= 1000)
    if obj == "sphere":
        b.add_sphere(0.15, obj_pos, mass=1, color=(0.3, 0.8, 0.4))
    else:
        b.add_box([0.12, 0.08, 0.16], obj_pos, orientation=orientation,
                  mass=1, color=(0.3, 0.8, 0.4))
    return b


def _host_rollout(b, n_steps, forces=None):
    """Per-step PRE-step poses of every body (the snapshot-then-step order)
    + per-step sensor<->object pair force."""
    ids = sorted(b.bodies)
    traj = np.zeros((n_steps, len(ids), 3))
    force = np.zeros(n_steps)
    for t in range(n_steps):
        for r, bid in enumerate(ids):
            traj[t, r] = b.bodies[bid].position
        if forces is not None:
            for bid, f in forces(t):
                b.apply_external_force(bid, f)
        b.step()
        force[t] = sum(c.normal_force for c in b._contacts
                       if {c.body_a, c.body_b} == {1, 2})
    return traj, force


def _device_rollout(b0, n_steps, trial_quats=None, ext=None, k=1):
    sim, ids, consts = pack_scene(b0)
    tile = lambda a: np.tile(np.asarray(a)[None], (k,) + (1,) * a.ndim)
    quat = tile(consts["quat"])
    if trial_quats is not None:
        quat = trial_quats
    out = sim.simulate(tile(consts["pos"]), tile(consts["vel"]), quat,
                       tile(consts["sizes"]), tile(consts["mass"]), n_steps,
                       ext_forces=ext)
    return sim, np.asarray(out["pos"]), np.asarray(out["contact_force"])


class TestTrajectoryParity:
    @pytest.mark.parametrize("obj", ["sphere", "box"])
    def test_exp1_drop_matches_host(self, obj):
        rng = np.random.default_rng(3)
        x = rng.random(3)
        q = [np.sqrt(1 - x[0]) * np.sin(2 * np.pi * x[1]),
             np.sqrt(1 - x[0]) * np.cos(2 * np.pi * x[1]),
             np.sqrt(x[0]) * np.sin(2 * np.pi * x[2]),
             np.sqrt(x[0]) * np.cos(2 * np.pi * x[2])]
        host = _exp1_backend(obj, orientation=q)
        traj_h, force_h = _host_rollout(host, 300)

        dev = _exp1_backend(obj, orientation=q)
        sim, traj_d, cf = _device_rollout(dev, 300)
        # float32 vs float64 integration drift over 300 steps incl. impact
        np.testing.assert_allclose(traj_d[0], traj_h, atol=2e-3)
        # resting height must agree tightly (the physical invariant)
        np.testing.assert_allclose(traj_d[0, -1], traj_h[-1], atol=5e-4)
        # object is resting on the sensor at the end: the pair force equals
        # the host's restoring-impulse force
        f_d = cf[0, :, 2, sim.support_slot(1)]
        np.testing.assert_allclose(f_d[-50:], force_h[-50:], rtol=1e-4)

    def test_exp3_shock_and_movable_sensor(self):
        # exp_3: mass-100 sensor (movable), object dropped from 1.3, lateral
        # shock applied to the sensor during steps 130-160 — exercises the
        # leapfrog guard (movable body under the object) + external forces
        shock = np.array([55.0, -40.0, 0.0])
        host = _exp1_backend("box", sensor_mass=100, obj_pos=(0.0, 0.0, 1.3))
        traj_h, force_h = _host_rollout(
            host, 400,
            forces=lambda t: ([(1, shock)] if 130 <= t <= 160 else []))

        dev = _exp1_backend("box", sensor_mass=100, obj_pos=(0.0, 0.0, 1.3))
        ids = sorted(dev.bodies)
        ext = np.zeros((1, 400, len(ids), 3), np.float32)
        ext[0, 130:161, 1] = shock
        sim, traj_d, cf = _device_rollout(dev, 400, ext=ext)
        assert sim.movable == (False, True, True)
        np.testing.assert_allclose(traj_d[0], traj_h, atol=5e-3)
        # nothing leapfrogged to infinity (the round-3 bug class)
        assert np.abs(traj_d).max() < 10.0

    def test_support_drag_carries_rider(self):
        # Friction couples a body to its MOVING support (pybullet lateral
        # friction, exp_3's shocked sensor): a strong lateral shock on the
        # plate must drag the object riding it — not slide out from under it
        # and leave the object to free-fall in place (the pre-round-5
        # world-frame damping behavior).
        shock = np.array([8000.0, 0.0, 0.0])
        host = _exp1_backend("box", orientation=(0, 0, 0, 1),
                             sensor_mass=100, obj_pos=(0.0, 0.0, 1.3))
        traj_h, _ = _host_rollout(
            host, 500,
            forces=lambda t: ([(1, shock)] if 130 <= t <= 160 else []))
        plate_x, obj = traj_h[-1, 1], traj_h[-1, 2]
        assert obj[0] > 0.3, "object was not dragged with the plate"
        assert obj[2] > 0.9, "object fell off its support"
        assert abs(obj[0] - plate_x[0]) < 0.75, "object left the plate"
        assert plate_x[0] > obj[0] > 0.0, "object should lag the plate (slip)"

        dev = _exp1_backend("box", orientation=(0, 0, 0, 1),
                            sensor_mass=100, obj_pos=(0.0, 0.0, 1.3))
        ids = sorted(dev.bodies)
        ext = np.zeros((1, 500, len(ids), 3), np.float32)
        ext[0, 130:161, 1] = shock
        _, traj_d, _ = _device_rollout(dev, 500, ext=ext)
        np.testing.assert_allclose(traj_d[0], traj_h, atol=5e-3)

    def test_exp1_device_physics_cli_matches_host_path(self, tmp_path):
        """exp_1 --device-physics produces the same corpus as the host loop:
        same directory layout, all four PNG streams, and per-snapshot poses
        within float32 integration drift of the host engine's."""
        from mmdyn_tpu.cli.exp_1_flat_plane import main

        argv = ["--engine", "analytic", "--headless", "--n_objects", "2",
                "--trial_per_obj", "1", "--n_timesteps", "40",
                "--interval", "10", "--seed", "5"]
        main(argv + ["--logdir", str(tmp_path / "host")])
        main(argv + ["--device-physics", "--logdir", str(tmp_path / "dev")])

        host_seqs = sorted((tmp_path / "host").glob("**/sequence_*"))
        dev_seqs = sorted((tmp_path / "dev").glob("**/sequence_*"))
        assert [s.relative_to(tmp_path / "host") for s in host_seqs] == \
               [s.relative_to(tmp_path / "dev") for s in dev_seqs]
        for hs, ds in zip(host_seqs, dev_seqs):
            dh = json.loads((hs / "data.json").read_text())
            dd = json.loads((ds / "data.json").read_text())
            assert dh["time_step"] == dd["time_step"]
            np.testing.assert_allclose(dd["position"], dh["position"],
                                       atol=2e-3)
            np.testing.assert_allclose(dd["orientation"], dh["orientation"],
                                       atol=1e-6)
            for stem in ("visual", "tactile", "seg", "depth"):
                assert (ds / f"{stem}_0003.png").exists()

    def test_exp2_device_physics_cli_matches_host_path(self, tmp_path):
        """exp_2 --device-physics: the TILTED fixed sensor exercises the
        rotated-box support-plane math end to end (slide + contact force)."""
        from mmdyn_tpu.cli.exp_2_inclined_plane import main

        argv = ["--engine", "analytic", "--headless", "--n_objects", "1",
                "--trial_per_obj", "2", "--n_timesteps", "60",
                "--interval", "10", "--seed", "4", "--slope", "0.2"]
        main(argv + ["--logdir", str(tmp_path / "host")])
        main(argv + ["--device-physics", "--logdir", str(tmp_path / "dev")])

        host_seqs = sorted((tmp_path / "host").glob("**/sequence_*"))
        dev_seqs = sorted((tmp_path / "dev").glob("**/sequence_*"))
        assert host_seqs and len(host_seqs) == len(dev_seqs)
        for hs, ds in zip(host_seqs, dev_seqs):
            dh = json.loads((hs / "data.json").read_text())
            dd = json.loads((ds / "data.json").read_text())
            assert dh["time_step"] == dd["time_step"]
            np.testing.assert_allclose(dd["position"], dh["position"],
                                       atol=5e-3)
            np.testing.assert_allclose(dd["force"], dh["force"],
                                       rtol=0.05, atol=1.0)

    def test_exp3_device_physics_cli_matches_host_path(self, tmp_path):
        """exp_3 --device-physics: shock vectors identical (same RNG draws),
        poses within drift, per-snapshot sensor<->object force matching."""
        from mmdyn_tpu.cli.exp_3_force_pert import main

        argv = ["--engine", "analytic", "--headless", "--n_objects", "1",
                "--trial_per_obj", "2", "--n_timesteps", "200",
                "--interval", "10", "--snapshot_from", "100", "--seed", "9",
                "--force", "0.05"]
        main(argv + ["--logdir", str(tmp_path / "host")])
        main(argv + ["--device-physics", "--logdir", str(tmp_path / "dev")])

        host_seqs = sorted((tmp_path / "host").glob("**/sequence_*"))
        dev_seqs = sorted((tmp_path / "dev").glob("**/sequence_*"))
        assert host_seqs and len(host_seqs) == len(dev_seqs)
        for hs, ds in zip(host_seqs, dev_seqs):
            dh = json.loads((hs / "data.json").read_text())
            dd = json.loads((ds / "data.json").read_text())
            assert dh["time_step"] == dd["time_step"]
            np.testing.assert_allclose(dd["shock"], dh["shock"], rtol=1e-12)
            np.testing.assert_allclose(dd["position"], dh["position"],
                                       atol=5e-3)
            np.testing.assert_allclose(dd["force"], dh["force"],
                                       rtol=0.05, atol=1.0)

    def test_demo_device_physics_cli_matches_host_path(self, tmp_path):
        """demo --device-physics (the first-contact CLI a new user runs)
        matches the host stepping loop: same data.json poses within float32
        drift, all four PNG streams present."""
        from mmdyn_tpu.cli.demo import main

        argv = ["--engine", "analytic", "--headless", "--n_timesteps", "60",
                "--interval", "10", "--object", "winebottle"]
        main(argv + ["--logdir", str(tmp_path / "host")])
        main(argv + ["--device-physics", "--logdir", str(tmp_path / "dev")])

        dh = json.loads((tmp_path / "host/dataset/data.json").read_text())
        dd = json.loads((tmp_path / "dev/dataset/data.json").read_text())
        assert dh["time_step"] == dd["time_step"]
        assert "force" not in dd          # demo.py records poses only
        np.testing.assert_allclose(dd["position"], dh["position"], atol=2e-3)
        np.testing.assert_allclose(dd["orientation"], dh["orientation"],
                                   atol=1e-6)
        for stem in ("visual", "tactile", "seg", "depth"):
            assert (tmp_path / f"dev/dataset/{stem}_0005.png").exists()

    def test_vmapped_trials_match_loop(self):
        """K batched trials == K single simulations (vmap correctness)."""
        rng = np.random.default_rng(7)
        k = 4
        base = _exp1_backend("box")
        sim, ids, consts = pack_scene(base)
        quats = np.tile(consts["quat"][None], (k, 1, 1))
        for i in range(k):
            x = rng.random(3)
            quats[i, 2] = [np.sqrt(1 - x[0]) * np.sin(2 * np.pi * x[1]),
                           np.sqrt(1 - x[0]) * np.cos(2 * np.pi * x[1]),
                           np.sqrt(x[0]) * np.sin(2 * np.pi * x[2]),
                           np.sqrt(x[0]) * np.cos(2 * np.pi * x[2])]
        tile = lambda a: np.tile(np.asarray(a)[None], (k,) + (1,) * a.ndim)
        out = sim.simulate(tile(consts["pos"]), tile(consts["vel"]), quats,
                           tile(consts["sizes"]), tile(consts["mass"]), 120)
        batched = np.asarray(out["pos"])
        for i in range(k):
            single = sim.simulate(consts["pos"][None], consts["vel"][None],
                                  quats[i][None], consts["sizes"][None],
                                  consts["mass"][None], 120)
            np.testing.assert_allclose(batched[i],
                                       np.asarray(single["pos"])[0],
                                       atol=1e-6)
