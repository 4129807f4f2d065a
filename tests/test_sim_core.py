"""Simulator core tests: camera pipeline round-trips (the reference's own
test strategy, tact_sim/tests/test_camera.py), shader, normals, transforms,
analytic physics, and the full tactile sensor path without PyBullet."""

import numpy as np
import pytest

from mmdyn_tpu.sim.camera import Camera, look_at
from mmdyn_tpu.sim.contact import Contact
from mmdyn_tpu.sim.geometry import (interpolate_pose, list2pose_stamped,
                                    matrix_from_pose, pose_from_matrix,
                                    pose_stamped2list, transform_body,
                                    unit_pose)
from mmdyn_tpu.sim.normals import grid_normals, knn_pca_normals
from mmdyn_tpu.sim.physics import AnalyticBackend
from mmdyn_tpu.sim.sensor import make_sensor
from mmdyn_tpu.sim.shader import Shader
from mmdyn_tpu.sim.transforms import (apply_transformation,
                                      get_transformation_matrix,
                                      quat_from_euler, quat_to_matrix)


def _camera():
    cam = Camera(width=64, height=48)
    cam.set_projection_matrix(fovy=60, aspect=1, near=0.5, far=10)
    cam.set_view_matrix([0, 0, 2], [0, 0, 0], [0, 1, 0])
    return cam


class TestCamera:
    def test_project_unproject_roundtrip(self):
        """project_3D_to_pixel o unproject_pixel_to_3D == identity
        (reference test_camera.py:20-29)."""
        cam = _camera()
        pts = np.array([[0.1, -0.2, 0.0], [0.05, 0.1, -0.3],
                        [0.5, 0.2, 1.0]]).T
        pix = cam.project_3D_to_pixel(pts)
        back = cam.unproject_pixel_to_3D(pix)
        np.testing.assert_allclose(back, pts, atol=1e-8)

    def test_depth_buffer_conversions_inverse(self):
        cam = _camera()
        z_e = np.linspace(0.6, 9.0, 13)
        z_b = cam.real_depth_to_buffer(z_e)
        assert (z_b >= 0).all() and (z_b <= 1).all()
        np.testing.assert_allclose(cam.depth_buffer_to_real(z_b), z_e, rtol=1e-9)

    def test_window_ndc_inverse(self):
        cam = _camera()
        pix = np.array([[3.0, 40.0, 1.2], [60.0, 2.0, 7.7]]).T
        np.testing.assert_allclose(cam.ndc_to_window(cam.window_to_ndc(pix)),
                                   pix, atol=1e-10)

    def test_canvas_pointcloud_roundtrip(self):
        """unproject canvas -> pointcloud -> project back == same canvas
        (reference test_camera.py:31-45, against a rendered image)."""
        backend = AnalyticBackend()
        backend.add_sphere(0.3, [0, 0, 0.6], color=(0, 1, 0))
        cam = Camera(width=64, height=48, backend=backend)
        cam.set_projection_matrix(fovy=70, aspect=1, near=0.2, far=5)
        cam.set_view_matrix([0, 0, 2.5], [0, 0, 0], [0, 1, 0])
        rgb, depth, seg = cam.get_image()

        points, colors = cam.unproject_canvas_to_pointcloud(rgb, depth)
        rgb2, depth2 = cam.project_pointcloud_to_canvas(points, colors)
        np.testing.assert_allclose(depth2, depth, atol=1e-6)
        np.testing.assert_array_equal(rgb2[:, :, :3], np.asarray(rgb)[:, :, :3])

    def test_look_at_convention(self):
        """Points in front of the camera have negative eye-space z (OpenGL)."""
        view = look_at([0, 0, 2], [0, 0, 0], [0, 1, 0])
        p = view @ np.array([0, 0, 0, 1.0])
        assert p[2] < 0


class TestShader:
    def test_directional_phong_values(self):
        """Hand-computed single-light Phong on an upward normal."""
        sh = Shader(k_specular=0.0, k_diffuse=1.0, k_ambient=0.5, alpha=1,
                    ambient_lightning=2.0, directional_light=True)
        sh.set_lights(positions=[[0, 0, 5]], directions=[[0, 0, 1]],
                      i_speculars=[[0, 0, 0]], i_diffuses=[[1, 1, 1]])
        pts = np.zeros((3, 4))
        normals = np.tile(np.array([[0, 0, 1.0]]).T, (1, 4))
        illum = sh.illumination(pts, normals, viewer=[0, 0, 2])
        # ambient 0.5*2 + diffuse 1*1*(L.N=1) = 2.0 per channel
        np.testing.assert_allclose(illum, 2.0)

    def test_backfacing_light_clipped(self):
        sh = Shader(k_specular=0.0, k_diffuse=1.0, k_ambient=0.0, alpha=1,
                    ambient_lightning=0.0)
        sh.set_lights(positions=[[0, 0, -5]], directions=[[0, 0, -1]],
                      i_speculars=[[0, 0, 0]], i_diffuses=[[1, 1, 1]])
        normals = np.tile(np.array([[0, 0, 1.0]]).T, (1, 3))
        illum = sh.illumination(np.zeros((3, 3)), normals, viewer=[0, 0, 2])
        # N.L < 0 clipped to 0; R = -L, specular off -> total 0... but R.V can
        # still contribute via diffuse=0; expect exactly 0
        np.testing.assert_allclose(np.asarray(illum, dtype=float),
                                   np.zeros((3, 3)), atol=1e-12)

    def test_shade_image_clips(self):
        sh = Shader()
        img = np.full((2, 3, 4), 200.0)
        illum = np.full((3, 6), 2.0)
        out = sh.shade_image(img, illum)
        assert out.shape == (2, 3, 3)
        assert out.max() == 255


class TestNormals:
    def test_grid_normals_of_plane(self):
        """A flat z-plane grid has +z normals everywhere (towards camera)."""
        h, w = 8, 10
        xs, ys = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
        pts = np.stack([xs.reshape(-1), ys.reshape(-1), np.zeros(h * w)])
        n = grid_normals(pts, (h, w), camera_location=(0, 0, 5))
        np.testing.assert_allclose(n[2], 1.0, atol=1e-9)

    def test_grid_normals_of_sphere_match_analytic(self):
        """Grid normals on a sphere cap approximate the radial direction."""
        h, w = 30, 30
        xs, ys = np.meshgrid(np.linspace(-0.5, 0.5, w), np.linspace(-0.5, 0.5, h))
        zs = np.sqrt(1.0 - xs ** 2 - ys ** 2)
        pts = np.stack([xs.reshape(-1), ys.reshape(-1), zs.reshape(-1)])
        n = grid_normals(pts, (h, w), camera_location=(0, 0, 10))
        # analytic normal is the point itself (unit sphere)
        cosang = np.sum(n * pts, axis=0)
        assert np.median(cosang) > 0.999

    def test_knn_pca_normals_plane(self):
        rng = np.random.default_rng(0)
        pts = np.concatenate([rng.uniform(size=(2, 200)),
                              np.zeros((1, 200))], axis=0)
        n = knn_pca_normals(pts, camera_location=(0, 0, 5))
        np.testing.assert_allclose(np.abs(n[2]), 1.0, atol=1e-6)
        assert (n[2] > 0).all()  # oriented towards camera


class TestGeometryTransforms:
    def test_pose_matrix_roundtrip(self):
        pose = list2pose_stamped([0.1, -0.2, 0.3, 0.0, 0.0, 0.7071068, 0.7071068])
        back = pose_from_matrix(matrix_from_pose(pose))
        np.testing.assert_allclose(pose_stamped2list(back),
                                   pose_stamped2list(pose), atol=1e-7)

    def test_transform_body_identity(self):
        pose = list2pose_stamped([1, 2, 3, 0, 0, 0, 1])
        out = transform_body(pose, unit_pose())
        np.testing.assert_allclose(pose_stamped2list(out),
                                   pose_stamped2list(pose), atol=1e-12)

    def test_interpolate_pose_endpoints(self):
        p0 = list2pose_stamped([0, 0, 0, 0, 0, 0, 1])
        p1 = list2pose_stamped([1, 0, 0, 0, 0, 0.7071068, 0.7071068])
        poses = interpolate_pose(p0, p1, N=5)
        np.testing.assert_allclose(pose_stamped2list(poses[0]),
                                   pose_stamped2list(p0), atol=1e-7)
        np.testing.assert_allclose(pose_stamped2list(poses[-1]),
                                   pose_stamped2list(p1), atol=1e-7)

    def test_apply_transformation(self):
        t = get_transformation_matrix([1, 0, 0], quat_from_euler([0, 0, np.pi / 2]))
        out = apply_transformation(np.array([[1.0, 0, 0]]), t)
        np.testing.assert_allclose(out, [[1.0, 1.0, 0.0]], atol=1e-9)

    def test_quat_matrix_matches_formula(self):
        q = quat_from_euler([0.3, -0.2, 0.5])
        m = quat_to_matrix(q)
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(m) == pytest.approx(1.0)


class TestAnalyticPhysics:
    def test_falling_sphere_settles_on_box(self):
        backend = AnalyticBackend()
        sensor_box = backend.add_box([0.75, 0.75, 0.5], [0, 0, 0.5],
                                     fixed=True, color=(1, 0.6, 0))
        ball = backend.add_sphere(0.1, [0, 0, 2.0], mass=0.5)
        for _ in range(1000):
            backend.step()
        pos, _ = backend.get_pose(ball)
        assert pos[2] == pytest.approx(1.0 + 0.1, abs=0.02)
        contacts = Contact(sensor_box, backend)
        assert ball in contacts.unique_ids
        assert contacts.total_force(ball) == pytest.approx(0.5 * 10, rel=0.2)

    def test_box_settles_on_movable_box(self):
        """Regression: a MOVABLE support box (exp_3's mass-100 shocked
        sensor) used to 'collide' with the falling box's top face from
        below, leapfrogging both bodies upward forever (the exp_3 corpus
        corrupter). A top-face contact requires the body's center above
        the face plane."""
        backend = AnalyticBackend()
        sensor_box = backend.add_box([0.75, 0.75, 0.5], [0, 0, 0.5],
                                     fixed=False, mass=100.0)
        box = backend.add_box([0.1, 0.1, 0.12], [0, 0, 1.3], mass=1.0)
        for _ in range(1000):
            backend.step()
        pos, _ = backend.get_pose(box)
        spos, _ = backend.get_pose(sensor_box)
        assert pos[2] == pytest.approx(1.0 + 0.12, abs=0.02)
        assert spos[2] == pytest.approx(0.5, abs=0.02)

    def test_sphere_falls_to_ground_plane_beside_box(self):
        backend = AnalyticBackend()
        backend.add_box([0.5, 0.5, 0.5], [0, 0, 0.5], fixed=True)
        ball = backend.add_sphere(0.1, [2.0, 2.0, 1.0], mass=1.0)
        for _ in range(800):
            backend.step()
        pos, _ = backend.get_pose(ball)
        assert pos[2] == pytest.approx(0.1, abs=0.02)

    def test_render_seg_and_depth(self):
        backend = AnalyticBackend()
        backend.add_box([0.75, 0.75, 0.5], [0, 0, 0.5], fixed=True)
        ball = backend.add_sphere(0.2, [0, 0, 1.5], mass=1.0)
        cam = Camera(width=80, height=60, backend=backend)
        cam.set_projection_matrix(fovy=60, aspect=1, near=0.9, far=10)
        cam.set_view_matrix([0, 0, 0.0], [0, 0, 2.0], [0, 1, 0])  # look up
        rgb, depth, seg = cam.get_image()
        assert rgb.shape == (60, 80, 4) and seg.shape == (60, 80)
        assert (seg == ball).any()          # ball visible
        assert (depth >= 0).all() and (depth <= 1).all()
        # ball pixels are nearer than background
        assert depth[seg == ball].mean() < depth[seg == -1].mean() if (seg == -1).any() else True


class TestTactileSensorEndToEnd:
    def test_full_tactile_pipeline_analytic(self):
        """make_sensor + falling sphere -> clipped images, pointcloud,
        tactile image — the demo.py inner loop without PyBullet."""
        backend = AnalyticBackend()
        sensor = make_sensor(backend, size=[1.5, 1.5, 1.0],
                             position=[0, 0, 0.5], sensor_vector=[0, 0, 1],
                             thickness=0.05)
        ball = backend.add_sphere(0.15, [0.1, -0.1, 1.4], mass=0.5)
        for _ in range(400):
            backend.step()

        rgb, rgb_clip, depth_clip, seg, seg_clip = sensor.get_sensor_image()
        assert rgb.shape == (480, 640, 4)
        assert float(depth_clip.max()) <= float(sensor.max_buffer_depth) + 1e-9
        assert (np.asarray(rgb_clip) == sensor.background_color).all()
        assert not sensor.is_blank(seg_clip)  # ball is inside the gel layer

        pcd = sensor.get_sensor_pointcloud(rgb_clip, depth_clip)
        assert pcd.points.shape == (3, 640 * 480)
        assert pcd.normals.shape == (3, 640 * 480)

        tactile = sensor.get_tactile_image(rgb_clip, depth_clip, pcd)
        assert tactile.shape == (480, 640, 4)
        assert tactile.dtype == np.uint8
        # the contact region must differ from the uniform background
        assert np.asarray(tactile[:, :, :3]).std() > 0

    def test_blank_when_object_out_of_range(self):
        backend = AnalyticBackend()
        sensor = make_sensor(backend, size=[1.5, 1.5, 1.0],
                             position=[0, 0, 0.5], sensor_vector=[0, 0, 1],
                             thickness=0.01)
        backend.add_sphere(0.15, [0.0, 0.0, 3.5], mass=0.5)  # far above
        _, _, _, _, seg_clip = sensor.get_sensor_image()
        assert sensor.is_blank(seg_clip)

    def test_apply_command_velocity(self):
        backend = AnalyticBackend()
        sensor = make_sensor(backend, size=[1.0, 1.0, 0.5],
                             position=[0, 0, 0.25], sensor_vector=[0, 0, 1])
        sensor.apply_command([0, 0, 240.0, 0, 0, 0], velocity=True,
                             local_coord=False)
        pos, _ = backend.get_pose(sensor.sensor_id)
        assert pos[2] == pytest.approx(0.25 + 1.0, abs=1e-6)


class TestForceModeAndExtras:
    def test_use_force_equilibrium_path(self):
        """Force-matching STS mode: image buffer + binary-search equilibrium
        (sensor.py:447-474)."""
        backend = AnalyticBackend()
        sensor = make_sensor(backend, size=[1.5, 1.5, 1.0],
                             position=[0, 0, 0.5], sensor_vector=[0, 0, 1],
                             thickness=0.05, use_force=True)
        backend.add_sphere(0.15, [0.0, 0.0, 1.2], mass=0.5)
        outs = None
        for t in range(300):
            backend.step()
            if (t + 1) % 50 == 0:
                outs = sensor.get_sensor_image()
        rgb, rgb_eq, depth_eq, seg, seg_eq = outs
        # the buffer stores 3 channels (reference utils.py:145), so the
        # equilibrium image comes back (H, W, 3)
        assert rgb_eq.shape == (480, 640, 3)
        assert depth_eq.shape == (480, 640)
        assert sensor._image_buf.pointer > 0
        # the equilibrium image comes from the buffer and respects the clip
        assert float(np.max(depth_eq)) <= float(sensor.max_buffer_depth) + 1e-9
        assert sensor.contacts is not None and len(sensor.contacts) >= 1

    def test_raytraced_image_with_normals(self):
        backend = AnalyticBackend()
        ball = backend.add_sphere(0.3, [0, 0, 0.6], color=(0, 1, 0))
        from mmdyn_tpu.sim.camera import Camera
        cam = Camera(width=64, height=48, backend=backend)
        cam.set_projection_matrix(fovy=70, aspect=1, near=0.2, far=5)
        cam.set_view_matrix([0, 0, 2.5], [0, 0, 0], [0, 1, 0])
        rgb, depth, normals, seg = cam.get_raytraced_image()
        assert normals.shape == (48, 64, 3)
        hit = seg == ball
        assert hit.any()
        # sphere-facing normals point towards the camera (+z-ish)
        assert normals[hit][:, 2].mean() > 0.5

    def test_image_buffer_queries(self):
        from mmdyn_tpu.sim.utils import ImageBuffer
        buf = ImageBuffer(4, 3, size=5)
        for i in range(4):
            rgb = np.full((3, 4, 3), i, np.uint8)
            depth = np.full((3, 4), i / 10, np.float32)
            seg = np.full((3, 4), i, np.int32)
            buf.store(rgb, depth, seg, obj_z=1.0 - i * 0.1, t=i * 0.5)
        assert buf.get()["t"] == 1.5                      # latest
        assert buf.get(0.72, query="time")["t"] == 0.5     # nearest time
        assert buf.get(0.92, query="z")["z"] == pytest.approx(0.9)
        assert buf.get(1, query="idx")["t"] == 0.5
        assert buf.min_t == 0.0 and buf.max_z == pytest.approx(1.0)
        buf.reset()
        assert buf.pointer == 0

    def test_image_buffer_seg_uint8_wrap_quirk(self):
        """The reference stores seg in a uint8 buffer (utils.py:129), so the
        clipped value -1 wraps to 255 in retrieved frames; int32 is opt-in."""
        from mmdyn_tpu.sim.utils import ImageBuffer
        rgb = np.zeros((3, 4, 3), np.uint8)
        depth = np.zeros((3, 4), np.float32)
        seg = np.full((3, 4), -1, np.int32)
        buf = ImageBuffer(4, 3, size=2)
        buf.store(rgb, depth, seg, obj_z=0.0, t=0.0)
        assert buf.get()["seg_img"].dtype == np.uint8
        assert (buf.get()["seg_img"] == 255).all()
        signed = ImageBuffer(4, 3, size=2, seg_dtype=np.int32)
        signed.store(rgb, depth, seg, obj_z=0.0, t=0.0)
        assert (signed.get()["seg_img"] == -1).all()
        # reset preserves capacity (reference's reset() shrinks to the fill
        # count, utils.py:196-201 — a bug we do not replicate)
        buf.reset()
        buf.store(rgb, depth, seg, 0.0, 0.0)
        buf.store(rgb, depth, seg, 0.0, 0.0)
        assert buf.pointer == 0 and buf.size == 2  # wrapped at capacity

    def test_video_writer(self, tmp_path):
        from mmdyn_tpu.sim.utils import Video
        v = Video(width=64, height=48, file_name="clip", logdir=str(tmp_path))
        for i in range(5):
            v.write(np.full((48, 64, 3), i * 40, np.uint8))
        v.close()
        avis = list(tmp_path.glob("clip*.avi"))
        assert avis and avis[0].stat().st_size > 0


class TestGeometryExtras:
    def test_offset_local_pose(self):
        from mmdyn_tpu.sim.geometry import offset_local_pose
        # identity orientation: local offset == world offset
        pose = list2pose_stamped([1, 2, 3, 0, 0, 0, 1])
        out = offset_local_pose(pose, [0.5, 0, 0])
        np.testing.assert_allclose(pose_stamped2list(out)[:3], [1.5, 2, 3],
                                   atol=1e-9)
        # 90-degree yaw: local +x is world +y
        pose = list2pose_stamped([0, 0, 0] + list(quat_from_euler([0, 0, np.pi / 2])))
        out = offset_local_pose(pose, [1.0, 0, 0])
        np.testing.assert_allclose(pose_stamped2list(out)[:3], [0, 1, 0],
                                   atol=1e-9)

    def test_rotate_local_pose(self):
        from mmdyn_tpu.sim.geometry import rotate_local_pose
        pose = list2pose_stamped([0.3, 0, 0, 0, 0, 0, 1])
        out = rotate_local_pose(pose, [0, 0, np.pi / 2])
        q = pose_stamped2list(out)[3:]
        np.testing.assert_allclose(np.abs(q), np.abs(quat_from_euler([0, 0, np.pi / 2])),
                                   atol=1e-9)

    def test_get_2d_pose_and_unwrap(self):
        from mmdyn_tpu.sim.geometry import get_2d_pose, unwrap
        pose = list2pose_stamped([1, 2, 0] + list(quat_from_euler([0, 0, 0.7])))
        out = get_2d_pose(pose)
        np.testing.assert_allclose(out, [1, 2, 0.7], atol=1e-9)
        np.testing.assert_allclose(unwrap([3.5 * np.pi / 2 + np.pi, -4.0]),
                                   [3.5 * np.pi / 2 + np.pi - 2 * np.pi,
                                    -4.0 + 2 * np.pi], atol=1e-12)

    def test_convert_reference_frame_list(self):
        from mmdyn_tpu.sim.geometry import convert_reference_frame_list
        poses = [list2pose_stamped([i, 0, 0, 0, 0, 0, 1]) for i in range(3)]
        out = convert_reference_frame_list(poses, unit_pose(), unit_pose())
        for a, b in zip(out, poses):
            np.testing.assert_allclose(pose_stamped2list(a),
                                       pose_stamped2list(b), atol=1e-12)
