"""On-device tactile renderer vs the host (numpy) pipeline."""

import numpy as np

from mmdyn_tpu.sim.physics import AnalyticBackend
from mmdyn_tpu.sim.sensor import make_sensor
from mmdyn_tpu.sim.tactile_jax import TactileRendererJax


def _scene():
    backend = AnalyticBackend()
    sensor = make_sensor(backend, size=[1.5, 1.5, 1.0], position=[0, 0, 0.5],
                         sensor_vector=[0, 0, 1], thickness=0.05)
    backend.add_sphere(0.15, [0.05, -0.1, 1.4], mass=0.5)
    for _ in range(400):
        backend.step()
    return backend, sensor


def test_matches_host_pipeline():
    backend, sensor = _scene()
    _, rgb_clip, depth_clip, _, _ = sensor.get_sensor_image()
    pcd = sensor.get_sensor_pointcloud(rgb_clip, depth_clip)
    host = sensor.get_tactile_image(rgb_clip, depth_clip, pcd)[:, :, :3]

    renderer = TactileRendererJax.from_sensor(sensor)
    dev = np.asarray(renderer(np.asarray(depth_clip)[None]))[0]

    diff = np.abs(host.astype(int) - dev.astype(int))
    # identical math modulo float precision: f32 normals at the contact-edge
    # depth discontinuity can flip specular highlights on a handful of pixels
    assert (diff <= 1).mean() > 0.998, f"frac within 1: {(diff <= 1).mean()}"
    assert (diff.max(axis=2) > 1).sum() < 2000  # edge pixels only


def test_batched_rendering_shapes():
    backend, sensor = _scene()
    _, _, depth_clip, _, _ = sensor.get_sensor_image()
    renderer = TactileRendererJax.from_sensor(sensor)
    batch = np.stack([np.asarray(depth_clip)] * 3)
    out = np.asarray(renderer(batch))
    assert out.shape == (3, 480, 640, 3)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[0], out[2])


def test_per_frame_state_matches_static_path():
    """render_frames with the sensor's own captured state must reproduce the
    static-matrix path exactly (same math, per-frame plumbing)."""
    backend, sensor = _scene()
    _, _, depth_clip, _, _ = sensor.get_sensor_image()
    renderer = TactileRendererJax.from_sensor(sensor)
    static = np.asarray(renderer(np.asarray(depth_clip)[None]))

    m_inv, eye, dirs = TactileRendererJax.capture_frame_state(sensor)
    dyn = np.asarray(renderer.render_frames(
        np.asarray(depth_clip)[None], m_inv[None], eye[None], dirs[None]))
    diff = np.abs(static.astype(int) - dyn.astype(int))
    assert (diff <= 1).mean() > 0.9999, f"frac within 1: {(diff <= 1).mean()}"


def test_demo_device_render_dump_parity(tmp_path):
    """--device-render (now the fully device-side DeferredFrames path on the
    analytic engine: raycast + tactile shading on the accelerator) writes a
    dump equivalent to the host pipeline's: seg/depth near-exact, visual and
    tactile within 1 uint8 outside contact-edge pixels."""
    import cv2

    from mmdyn_tpu.cli import demo

    host_dir, dev_dir = tmp_path / "host", tmp_path / "dev"
    common = ["--headless", "--engine", "analytic", "--n_timesteps", "120",
              "--interval", "20", "--seed", "3", "--object", "bowl"]
    demo.main(common + ["--logdir", str(host_dir)])
    demo.main(common + ["--logdir", str(dev_dir), "--device-render"])

    for stream, n_expected in (("tactile", 6), ("visual", 6)):
        host_pngs = sorted((host_dir / "dataset").glob(f"{stream}_*.png"))
        dev_pngs = sorted((dev_dir / "dataset").glob(f"{stream}_*.png"))
        assert len(host_pngs) == len(dev_pngs) == n_expected
        for hp, dp in zip(host_pngs, dev_pngs):
            a = cv2.imread(str(hp)).astype(int)
            b = cv2.imread(str(dp)).astype(int)
            diff = np.abs(a - b)
            assert (diff <= 1).mean() > 0.998, (hp.name, (diff <= 1).mean())
    # depth: within one uint8 quantum (f32 device vs f64 host); seg: a thin
    # contact-edge band at most
    for k in range(6):
        a = cv2.imread(str(host_dir / "dataset" / f"depth_{k:04d}.png")).astype(int)
        b = cv2.imread(str(dev_dir / "dataset" / f"depth_{k:04d}.png")).astype(int)
        assert np.abs(a - b).max() <= 1, f"depth_{k:04d}"
        a = cv2.imread(str(host_dir / "dataset" / f"seg_{k:04d}.png"))
        b = cv2.imread(str(dev_dir / "dataset" / f"seg_{k:04d}.png"))
        assert (a != b).mean() < 0.002, f"seg_{k:04d}: {(a != b).mean()}"


def test_make_deferred_routing():
    """Analytic + use_force=False sensors get the fully device-side
    DeferredFrames; a use_force sensor (equilibrium image buffer) must keep
    the host-raycast DeferredTactile."""
    from mmdyn_tpu.cli._simrun import (DeferredFrames, DeferredTactile,
                                       make_deferred)

    backend, sensor = _scene()
    assert isinstance(make_deferred(sensor), DeferredFrames)

    backend2 = AnalyticBackend()
    sensor2 = make_sensor(backend2, size=[1.5, 1.5, 1.0],
                          position=[0, 0, 0.5], sensor_vector=[0, 0, 1],
                          thickness=0.05, use_force=True)
    assert isinstance(make_deferred(sensor2), DeferredTactile)


def test_deferred_frames_moving_sensor_parity(tmp_path):
    """DeferredFrames with a sensor that moves mid-rollout (the exp_3 shock)
    must render every frame from its own captured camera state and match the
    host pipeline per frame."""
    import cv2

    from mmdyn_tpu.cli._simrun import DeferredFrames, snapshot

    backend, sensor = _scene()
    obj_id = backend.last_body_id()
    host_dir, dev_dir = tmp_path / "host", tmp_path / "dev"
    poses = [([0.0, 0.0, 0.5], [0, 0, 0, 1]),
             ([0.22, 0.12, 0.55], [0, 0, 0, 1])]

    for i, (p, q) in enumerate(poses):
        backend.set_pose(sensor.sensor_id, p, q)
        snapshot(sensor, obj_id, host_dir, i)

    d = DeferredFrames()
    for i, (p, q) in enumerate(poses):
        backend.set_pose(sensor.sensor_id, p, q)
        d.add_snapshot(sensor, obj_id, dev_dir, i)
    assert len(d) == 2
    assert d.flush() == 2

    for i in range(2):
        for stream in ("visual", "tactile"):
            a = cv2.imread(str(host_dir / f"{stream}_{i:04d}.png")).astype(int)
            b = cv2.imread(str(dev_dir / f"{stream}_{i:04d}.png")).astype(int)
            diff = np.abs(a - b)
            assert (diff <= 1).mean() > 0.998, (stream, i, (diff <= 1).mean())
        a = cv2.imread(str(host_dir / f"depth_{i:04d}.png")).astype(int)
        b = cv2.imread(str(dev_dir / f"depth_{i:04d}.png")).astype(int)
        assert np.abs(a - b).max() <= 1, f"depth_{i:04d}"
        a = cv2.imread(str(host_dir / f"seg_{i:04d}.png"))
        b = cv2.imread(str(dev_dir / f"seg_{i:04d}.png"))
        assert (a != b).mean() < 0.002, f"seg_{i:04d}: {(a != b).mean()}"

    # the displacement must actually change the rendering (moving path taken)
    t0 = cv2.imread(str(dev_dir / "tactile_0000.png"))
    t1 = cv2.imread(str(dev_dir / "tactile_0001.png"))
    assert not np.array_equal(t0, t1)


def test_deferred_flush_routes_static_vs_moving(tmp_path, monkeypatch):
    """A static sensor's frames take the cheaper baked-matrix path; a sensor
    that moved mid-rollout must take the per-frame-matrix path (exp_3)."""
    from mmdyn_tpu.cli._simrun import DeferredTactile

    calls = {"static": 0, "dynamic": 0}
    orig_call = TactileRendererJax.__call__
    orig_frames = TactileRendererJax.render_frames

    def spy_call(self, depths):
        calls["static"] += 1
        return orig_call(self, depths)

    def spy_frames(self, *a):
        calls["dynamic"] += 1
        return orig_frames(self, *a)

    monkeypatch.setattr(TactileRendererJax, "__call__", spy_call)
    monkeypatch.setattr(TactileRendererJax, "render_frames", spy_frames)

    backend, sensor = _scene()
    _, _, depth, _, _ = sensor.get_sensor_image()

    d = DeferredTactile()
    d.add(sensor, depth, tmp_path, 0)
    d.add(sensor, depth, tmp_path, 1)
    d.flush()
    assert calls == {"static": 1, "dynamic": 0}
    assert (tmp_path / "tactile_0000.png").exists()

    # displace the sensor (the exp_3 shock) between snapshots
    d2 = DeferredTactile()
    d2.add(sensor, depth, tmp_path, 2)
    backend.set_pose(sensor.sensor_id, [0.3, 0.1, 0.5], [0, 0, 0, 1])
    _, _, depth2, _, _ = sensor.get_sensor_image()   # updates the camera
    d2.add(sensor, depth2, tmp_path, 3)
    d2.flush()
    assert calls["dynamic"] == 1
    assert (tmp_path / "tactile_0003.png").exists()
