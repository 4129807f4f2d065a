"""Tests for ROS camera models, pose plots, progress bar, assets, sampling.

The stereo camera tests mirror the reference's own
tact_sim/tests/test_ros_camera.py (hard-coded real calibration fixtures,
project<->unproject consistency, delta inverses).
"""

import numpy as np
import pytest

from mmdyn_tpu.sim.assets import synthetic_object_catalog, preload_object
from mmdyn_tpu.sim.ros_camera import ROSPinholeCameraModel, ROSStereoCameraModel
from mmdyn_tpu.sim.sample import sample_pose, sample_positions
from mmdyn_tpu.utils.plots import plot_pose_tensorboard, plot_single_pose_tensorboard
from mmdyn_tpu.utils.training import format_time, progress_bar, save_pkl, load_pkl

# real calibration fixtures in the style of the reference test
# (test_ros_camera.py:8-31)
LEFT_PARAMS = dict(
    k=[430.15433, 0.0, 311.71339, 0.0, 430.60921, 221.06824, 0.0, 0.0, 1.0],
    d=[-0.363528858080088, 0.16117037733986861, -8.1109585007538829e-05,
       -0.00044776712298447841, 0.0],
    r=[0.99975321, 0.00505219, 0.02162504, -0.00509732, 0.99998565,
       0.00203206, -0.02161446, -0.00214189, 0.9997641],
    p=[295.53402, 0.0, 285.55805, 0.0, 0.0, 295.53402, 223.29201, 0.0,
       0.0, 0.0, 1.0, 0.0],
    width=640, height=480,
)
RIGHT_PARAMS = dict(
    k=[412.04678, 0.0, 313.96596, 0.0, 412.5877, 230.39125, 0.0, 0.0, 1.0],
    d=[-0.3560641041112021, 0.15647260261553159, -0.00016442960757099968,
       -0.00093175810713916221, 0.0],
    r=[0.9999244, 0.00192052, 0.01214498, -0.00189529, 0.99999607,
       -0.00208892, -0.01214895, 0.00206575, 0.99992407],
    p=[295.53402, 0.0, 285.55805, -26.21002, 0.0, 295.53402, 223.29201, 0.0,
       0.0, 0.0, 1.0, 0.0],
    width=640, height=480,
)


class TestPinhole:
    def test_project_and_ray_inverse(self):
        cam = ROSPinholeCameraModel()
        cam.from_camera_params(**LEFT_PARAMS)
        u, v = cam.project_3D_to_pixel([0.1, 0.2, 1.5])
        ray = cam.project_pixel_to_3DRay((u, v))
        # ray direction should point at the original point
        p = np.array([0.1, 0.2, 1.5])
        np.testing.assert_allclose(np.asarray(ray) / ray[2] * 1.5, p, atol=1e-6)

    def test_rectify_point_smoke(self):
        cam = ROSPinholeCameraModel()
        cam.from_camera_params(**LEFT_PARAMS)
        out = cam.rectify_point((320, 240))
        assert np.isfinite(out).all()

    def test_delta_inverses(self):
        cam = ROSPinholeCameraModel()
        cam.from_camera_params(**LEFT_PARAMS)
        z = 2.0
        du = cam.get_delta_u(0.5, z)
        assert cam.get_delta_x(du, z) == pytest.approx(0.5)
        dv = cam.get_delta_v(0.25, z)
        assert cam.get_delta_y(dv, z) == pytest.approx(0.25)


class TestStereo:
    def test_project_unproject_consistency(self):
        """(u, v, disparity) -> 3D -> (u, v) round trip over a grid
        (reference test_ros_camera.py:41-67)."""
        cam = ROSStereoCameraModel()
        cam.from_camera_params(LEFT_PARAMS, RIGHT_PARAMS)
        for u in (100, 320, 500):
            for v in (100, 240, 400):
                for disparity in (5.0, 12.5, 40.0):
                    xyz = cam.project_pixel_to_3D((u, v), disparity)
                    lp, rp = cam.project_3D_to_pixel(xyz)
                    assert lp[0] == pytest.approx(u, abs=1e-4)
                    assert lp[1] == pytest.approx(v, abs=1e-4)
                    assert lp[0] - rp[0] == pytest.approx(disparity, abs=1e-4)

    def test_z_disparity_inverse(self):
        cam = ROSStereoCameraModel()
        cam.from_camera_params(LEFT_PARAMS, RIGHT_PARAMS)
        assert cam.get_z(cam.get_disparity(1.7)) == pytest.approx(1.7)
        assert cam.get_z(0) == float("inf")


class TestAssetsAndSampling:
    def test_synthetic_catalog_schema(self):
        cat = synthetic_object_catalog(5, seed=1)
        assert len(cat) == 5
        for rec in cat:
            assert rec["shape"] in ("sphere", "box")
            assert rec["colors"] and len(rec["colors"][0]) == 4

    def test_preload_object_validates_name(self):
        with pytest.raises(AssertionError):
            preload_object("spoon")
        info = preload_object("winebottle")
        assert info["scale"] == [0.05] * 3

    def test_sample_pose_modes(self):
        np.random.seed(0)
        pos, orn = sample_pose([0, 0, 1.5])
        assert pos[2] == 1.5
        np.testing.assert_allclose(orn, [0, 0, 0, 1], atol=1e-12)
        _, orn = sample_pose([0, 0, 1.5], random_orn=True, random_chance=1.0)
        assert np.linalg.norm(orn) == pytest.approx(1.0)
        _, orn = sample_pose([0, 0, 1.5], random_yaw=True)
        assert orn[0] == pytest.approx(0.0, abs=1e-12)

    def test_sample_positions(self):
        ps, os_ = sample_positions([1, 2, 3], 4)
        assert len(ps) == 4 and len(os_) == 4
        assert all(p[2] == 3 for p in ps)


class TestUtils:
    def test_plot_pose_tensorboard_smoke(self):
        pose = np.tile(np.array([[0.1, 0.2, 0.3, 0.5, 0.5, 0.5, 0.5]]), (4, 1))
        fig = plot_pose_tensorboard(pose, pose, seq_length=4)
        assert fig is not None
        fig2 = plot_single_pose_tensorboard(pose, seq_length=4)
        assert fig2 is not None

    def test_progress_bar_no_tty(self, capsys):
        progress_bar(0, 3, "Loss 1.0")
        progress_bar(3, 3, "Loss 0.5")
        out = capsys.readouterr().out
        assert "Loss 0.5" in out and "3/3" in out

    def test_format_time(self):
        assert format_time(0.0) == "0ms"
        assert format_time(3661) == "1h1m"

    def test_pkl_roundtrip(self, tmp_path):
        save_pkl({"a": 1}, tmp_path / "x.pkl")
        assert load_pkl(tmp_path / "x.pkl") == {"a": 1}
