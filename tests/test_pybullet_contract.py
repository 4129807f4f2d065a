"""Contract tests for the Bullet-facing code paths, run against the
functional fake pybullet module (tests/fake_pybullet.py).

These give executed-line coverage to sim/pybullet_utils.py, PyBulletBackend,
the virtual-link / constraint / debug-line branches of sim/sensor.py, the
ShapeNetSem ingestion (sim/assets.py) and the demo / exp_1 CLIs' PyBullet
paths — none of which can run on real Bullet in this environment.
Call-sequence assertions check the code speaks the pybullet API correctly
(argument names are keyword-matched by the fake's signatures)."""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest

import tests.fake_pybullet as fake_pybullet

REPO = Path(__file__).resolve().parents[1]
BOTTLE_OBJ = REPO / "graphics/objects/winebottle/models/model_normalized.obj"
BOWL_OBJ = REPO / "graphics/objects/bowl/models/model_normalized.obj"


@pytest.fixture
def fake_p():
    fake = fake_pybullet.install()
    yield fake
    fake_pybullet.uninstall()


def _setup(fake_p):
    from mmdyn_tpu.sim.pybullet_utils import setup_pybullet
    return setup_pybullet(time_step=1.0 / 240, renders=False)


def _called(fake_p, name):
    return [kw for n, kw in fake_p.CALLS if n == name]


class TestPyBulletBackend:
    def test_setup_connect_sequence(self, fake_p):
        backend = _setup(fake_p)
        names = [n for n, _ in fake_p.CALLS]
        assert names[:2] == ["connect", "setAdditionalSearchPath"]
        assert "setTimeStep" in names and "loadURDF" in names \
            and "setGravity" in names
        assert backend.num_bodies() == 1          # the plane
        assert backend.time_step == pytest.approx(1.0 / 240)

    def test_step_pose_force_contacts_roundtrip(self, fake_p):
        backend = _setup(fake_p)
        from mmdyn_tpu.sim.pybullet_utils import add_object
        oid = add_object(backend, graphic_file=BOTTLE_OBJ,
                         collision_file=BOTTLE_OBJ, mass=1.0,
                         base_position=(0, 0, 0.5), mesh_scale=(0.05,) * 3)
        backend.set_pose(oid, (0, 0, 0.3), (0, 0, 0, 1))
        for _ in range(500):
            backend.step()
        pos, orn = backend.get_pose(oid)
        assert pos[2] == pytest.approx(0.15, abs=0.02)    # rests on the plane
        contacts = backend.contacts(oid)
        assert contacts and contacts[0].normal_force > 0
        backend.apply_external_force(oid, (50, 0, 0))
        backend.step()
        assert _called(fake_p, "applyExternalForce")[0]["frame"] == \
            fake_p.WORLD_FRAME
        backend.remove_body(oid)
        assert backend.num_bodies() == 1
        backend.reset()
        assert backend.num_bodies() == 0
        backend.disconnect()


class TestAddObject:
    def test_mesh_body_with_texture_color_inertia(self, fake_p):
        backend = _setup(fake_p)
        from mmdyn_tpu.sim.pybullet_utils import add_object
        oid = add_object(backend, graphic_file=BOWL_OBJ,
                         collision_file=BOWL_OBJ,
                         texture_file="some_texture.png", color=(1, 0, 0, 1),
                         diagonal_inertial=[0.1, 0.1, 0.1],
                         base_position=(0, 0, 1.0))
        assert _called(fake_p, "createVisualShape")[0]["meshScale"] == (1, 1, 1)
        assert _called(fake_p, "loadTexture")
        vis_calls = _called(fake_p, "changeVisualShape")
        assert vis_calls[0]["texture"] is not None
        assert vis_calls[1]["rgba"] == (1, 0, 0, 1)
        dyn = _called(fake_p, "changeDynamics")
        assert ("localInertiaDiagonal",) == dyn[-1]["keys"]
        # bbox approximation picked up the bowl's real extents
        assert np.allclose(backend.pybullet._backend.bodies[oid].size,
                           [0.15, 0.15, 0.055], atol=1e-3)

    def test_virtual_links_variant(self, fake_p):
        backend = _setup(fake_p)
        from mmdyn_tpu.sim.pybullet_utils import add_object
        oid = add_object(backend, graphic_file=BOTTLE_OBJ,
                         collision_file=BOTTLE_OBJ, virtual_links=True)
        assert _called(fake_p, "createMultiBody")[0]["n_links"] == 6
        assert backend.pybullet.getNumJoints(oid) == 6
        # per-link changeDynamics with joint limits (pybullet.py:118-127)
        dyn = _called(fake_p, "changeDynamics")
        assert len(dyn) == 6
        assert all("jointDamping" in d["keys"] for d in dyn)

    def test_constrained_variant_returns_constraint(self, fake_p):
        backend = _setup(fake_p)
        from mmdyn_tpu.sim.pybullet_utils import add_object, fix_object
        oid, cid = add_object(backend, graphic_file=BOTTLE_OBJ,
                              collision_file=BOTTLE_OBJ, constrained=True,
                              base_position=(0, 0, 2.0))
        assert _called(fake_p, "createConstraint")[0]["joint_type"] == \
            fake_p.JOINT_FIXED
        fix_object(backend, oid, cid, max_force=12345)
        assert _called(fake_p, "changeConstraint")[0]["max_force"] == 12345

    def test_add_objects_skips_unloadable_mesh(self, fake_p, capsys):
        backend = _setup(fake_p)
        from mmdyn_tpu.sim.pybullet_utils import add_objects
        ids = add_objects(
            backend,
            graphic_files=[BOTTLE_OBJ, "definitely_missing_mesh.obj"],
            collision_files=[BOTTLE_OBJ, "definitely_missing_mesh.obj"],
            texture_files=[(), ()], masses=[1, 1],
            base_positions=[(0, 0, 1), (0, 0, 2)],
            base_orientations=[(0, 0, 0, 1)] * 2,
            mesh_scales=[(1, 1, 1)] * 2, COM_shifts=[(0, 0, 0)] * 2)
        assert len(ids) == 1
        assert "skip" in capsys.readouterr().out

    def test_gui_controller_readback(self, fake_p):
        backend = _setup(fake_p)
        from mmdyn_tpu.sim.pybullet_utils import create_gui_controller
        motor_ids = create_gui_controller(backend, velocity=False, amp=2)
        assert len(motor_ids) == 6
        vals = [backend.pybullet.readUserDebugParameter(m) for m in motor_ids]
        assert vals == [0.0] * 6


class TestSensorBulletBranches:
    def test_sensor_renders_and_debug_lines(self, fake_p):
        backend = _setup(fake_p)
        from mmdyn_tpu.sim.sensor import make_sensor
        sensor = make_sensor(backend, size=[1.5, 1.5, 1],
                             position=[0, 0, 0.5], sensor_vector=[0, 0, 1])
        assert len(sensor.debug_line) == 5       # sensor.py:84-86
        out = sensor.get_sensor_image()
        rgb, rgb_eq, depth_eq, seg, seg_eq = out
        assert np.asarray(rgb).shape == (480, 640, 4)
        assert np.asarray(depth_eq).shape == (480, 640)
        assert sensor.is_blank(seg_eq)           # nothing on the sensor yet
        # the facing-direction line was re-drawn with replaceItemUniqueId
        replaced = [c for c in _called(fake_p, "addUserDebugLine")
                    if c["replace"] is not None]
        assert replaced

    def test_virtual_link_velocity_command_moves_sensor(self, fake_p):
        backend = _setup(fake_p)
        from mmdyn_tpu.sim.sensor import make_sensor
        sensor = make_sensor(backend, size=[1.0, 1.0, 0.5],
                             position=[0, 0, 0.25], sensor_vector=[0, 0, 1],
                             virtual_links=True)
        sensor.apply_command([0.5, 0, 0, 0, 0, 0], velocity=True)
        motor = _called(fake_p, "setJointMotorControl2")
        assert len(motor) == 6
        assert motor[0]["mode"] == fake_p.VELOCITY_CONTROL
        x0 = backend.get_pose(sensor.sensor_id)[0][0]
        for _ in range(240):
            backend.step()
        x1 = backend.get_pose(sensor.sensor_id)[0][0]
        assert x1 - x0 == pytest.approx(0.5, abs=0.01)   # 1 s at 0.5 m/s
        # position-control branch zeroes the targets
        sensor.apply_command([0, 0, 0, 0, 0, 0], velocity=False)
        assert _called(fake_p, "setJointMotorControl2")[-1]["mode"] == \
            fake_p.POSITION_CONTROL

    def test_constrained_sensor_command_via_constraint(self, fake_p):
        backend = _setup(fake_p)
        from mmdyn_tpu.sim.sensor import make_sensor
        sensor = make_sensor(backend, size=[1.0, 1.0, 0.5],
                             position=[0, 0, 0.25], sensor_vector=[0, 0, 1],
                             constrained=True)
        assert _called(fake_p, "createConstraint")   # sensor.py:58-67
        sensor.apply_command([1.0, 0, 0, 0, 0, 0], velocity=True,
                             local_coord=False)
        assert _called(fake_p, "changeConstraint")
        pos, _ = backend.get_pose(sensor.sensor_id)
        assert pos[0] == pytest.approx(1.0 / 240, rel=1e-6)
        cmds = sensor.get_command(
            fake_p.addUserDebugParameter("posX", -1, 1, 0.3) for _ in ())
        assert cmds == []


class TestShapeNetSemIngestion:
    """Synthetic metadata fixtures through the real pandas joins + the
    first-party OBJ/MTL parsing (dataset.py:94-198 parity)."""

    @pytest.fixture
    def sem_root(self, tmp_path):
        root = tmp_path / "ShapeNetSem"
        models = root / "models-OBJ" / "models"
        models.mkdir(parents=True)
        shutil.copy(BOWL_OBJ, models / "fixture_bowl.obj")
        shutil.copy(BOWL_OBJ.with_suffix(".mtl"), models / "fixture_bowl.mtl")
        shutil.copy(BOTTLE_OBJ, models / "fixture_bottle.obj")
        shutil.copy(BOTTLE_OBJ.with_suffix(".mtl"),
                    models / "fixture_bottle.mtl")
        (root / "categories.synset.csv").write_text(
            "category,synset\n"
            "Bowl,02880940\n"
            "WineBottle,04591713\n"
            "Hammer,03481172\n")
        # one NaN-riddled row to exercise the fillna defaults
        (root / "metadata.csv").write_text(
            "fullId,category,wnsynset,weight,unit,up,front\n"
            "wss.fixture_bowl,Bowl,02880940,0.35,1.0,\"0,0,1\",\"1,0,0\"\n"
            "wss.fixture_bottle,WineBottle,04591713,,,,\n"
            "wss.other_obj,Hammer,03481172,1.0,1.0,\"0,0,1\",\"1,0,0\"\n")
        return root

    def test_preload_join_and_nan_defaults(self, sem_root):
        from mmdyn_tpu.sim import config
        from mmdyn_tpu.sim.assets import preload_shapenet_sem
        meta, models_root = preload_shapenet_sem(path=sem_root,
                                                 category=("Bowl",))
        assert list(meta["fullId"]) == ["fixture_bowl"]   # wss. stripped
        meta_all, _ = preload_shapenet_sem(path=sem_root, category=("",))
        assert set(meta_all["fullId"]) == {"fixture_bowl", "fixture_bottle",
                                           "other_obj"}
        bottle = meta_all[meta_all["fullId"] == "fixture_bottle"].iloc[0]
        assert bottle["weight"] == config.DEFAULT_WEIGHT
        assert bottle["unit"] == config.DEFAULT_UNIT
        assert str(models_root).endswith("models-OBJ/models")

    def test_parse_row_colors_and_geometry(self, sem_root):
        from mmdyn_tpu.sim.assets import preload_shapenet_sem, parse_shapenet_sem
        meta, root = preload_shapenet_sem(path=sem_root, category=("Bowl",))
        info = parse_shapenet_sem(meta.iloc[0], root)
        assert info["obj_name"] == "fixture_bowl"
        assert info["colors"] and not info["textured_material"]
        assert np.linalg.norm(info["center_mass"]) < 0.05
        assert info["mesh_height"] == pytest.approx(0.11, abs=0.01)

    def test_exp1_end_to_end_on_fake_bullet(self, fake_p, sem_root, tmp_path):
        from mmdyn_tpu.cli.exp_1_flat_plane import main
        logdir = tmp_path / "logs"
        main(["--engine", "pybullet", "--headless", "--dataset_dir",
              str(sem_root), "--category", "Bowl", "--trial_per_obj", "1",
              "--n_timesteps", "30", "--interval", "10",
              "--fast-shading", "--logdir", str(logdir), "--seed", "3"])
        seqs = sorted(logdir.glob("*/*/sequence_*"))
        assert seqs, "no sequence dumped"
        seq = seqs[0]
        for stem in ("visual", "tactile", "seg", "depth"):
            assert (seq / f"{stem}_0000.png").exists()
        data = json.loads((seq / "data.json").read_text())
        assert len(data["position"]) == 3
        # the full Bullet render path executed
        assert _called(fake_p, "getCameraImage")


def test_demo_end_to_end_on_fake_bullet(fake_p, tmp_path, monkeypatch):
    """demo --engine pybullet with the bundled winebottle mesh: the
    preload_object -> add_object -> render -> dump pipeline (demo.py:36-115)."""
    monkeypatch.chdir(REPO)           # graphics/ resolves from the repo root
    from mmdyn_tpu.cli.demo import main
    main(["--engine", "pybullet", "--headless", "--n_timesteps", "30",
          "--interval", "10", "--fast-shading",
          "--logdir", str(tmp_path / "demo")])
    out = tmp_path / "demo" / "dataset"
    assert (out / "data.json").exists()
    assert (out / "visual_0002.png").exists()
    assert (out / "tactile_0002.png").exists()
    # winebottle mesh went through createVisualShape/createCollisionShape
    files = [c["fileName"] for c in _called(fake_p, "createCollisionShape")]
    assert any("winebottle" in f for f in files)


def test_preload_object_resolves_bundled_assets(tmp_path, monkeypatch):
    """graphics_root falls back to the repo-bundled meshes regardless of cwd
    and env (dataset.py:26-28 parity)."""
    monkeypatch.delenv("MMDYN_GRAPHICS_ROOT", raising=False)
    monkeypatch.chdir(tmp_path)
    from mmdyn_tpu.sim.assets import preload_object
    info = bottle = preload_object("winebottle")
    assert Path(info["obj"]).is_file()
    assert info["scale"] == [0.05] * 3
    info = preload_object("bowl")
    assert Path(info["obj"]).is_file() and info["scale"] == [1.0] * 3
    multi = preload_object("winebottle", n_objects=3)
    assert len(multi["obj"]) == 3


def test_sample_point_on_mesh_with_meshio():
    """sample_point_on_mesh parity path (sample.py:12-57) runs on the
    first-party mesh loader — point lies on the surface, frame orthonormal."""
    from mmdyn_tpu.sim.meshio import load_obj
    from mmdyn_tpu.sim.sample import sample_point_on_mesh
    np.random.seed(0)
    mesh = load_obj(BOWL_OBJ)
    point, normal, rot = sample_point_on_mesh(
        mesh, base_position=(1, 2, 3), base_orientation=(0, 0, 0, 1), scale=2)
    assert point.shape == (3,) and normal.shape == (3,)
    assert rot.shape == (4, 4) and rot[3, 3] == 1
    # columns orthonormal
    r = rot[:3, :3]
    np.testing.assert_allclose(np.linalg.norm(r, axis=0), 1.0, atol=1e-6)
    # the sampled point lies within the scaled+offset bbox
    lo = mesh.vertices.min(0) * 2 + np.array([1, 2, 3])
    hi = mesh.vertices.max(0) * 2 + np.array([1, 2, 3])
    assert np.all(point >= lo - 1e-6) and np.all(point <= hi + 1e-6)


def test_exp1_apply_sampled_position(tmp_path):
    """--apply-sampled-position actually uses the sampled Gaussian drop
    (the reference samples one and discards it, exp_1_flat_plane.py:83-108);
    on the analytic engine the logged trajectory then has nonzero x/y."""
    from mmdyn_tpu.cli.exp_1_flat_plane import main

    logdir = tmp_path / "logs"
    main(["--engine", "analytic", "--headless", "--n_objects", "1",
          "--trial_per_obj", "2", "--n_timesteps", "30", "--interval", "10",
          "--fast-shading", "--logdir", str(logdir), "--seed", "5",
          "--apply-sampled-position", "--drop-std", "0.2"])
    seqs = sorted(logdir.glob("**/sequence_*"))
    assert seqs
    xy = []
    for seq in seqs:
        data = json.loads((seq / "data.json").read_text())
        xy.append(np.abs(np.asarray(data["position"])[:, :2]).max())
    assert max(xy) > 0.01, "sampled drop position was not applied"

    # parity default: every drop from exactly (0, 0, 1.5)
    main(["--engine", "analytic", "--headless", "--n_objects", "1",
          "--trial_per_obj", "1", "--n_timesteps", "30", "--interval", "10",
          "--fast-shading", "--logdir", str(tmp_path / "logs0"),
          "--seed", "5"])
    seq0 = sorted((tmp_path / "logs0").glob("**/sequence_*"))[0]
    data0 = json.loads((seq0 / "data.json").read_text())
    assert np.abs(np.asarray(data0["position"])[:, :2]).max() < 1e-9
