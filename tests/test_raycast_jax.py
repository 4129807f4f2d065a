"""Parity of the batched device raycaster vs the host AnalyticBackend.

RaycastJax must reproduce AnalyticBackend.render (physics.py:282-331) —
same seg ids, same depth buffer, same Lambert-lit RGB — on plane/sphere/box
scenes, including rotated boxes and a moving camera across the batch.
Differences are f32-vs-mixed-precision only: we allow a thin contact-edge
band of pixels to disagree (ray-surface grazing) and ±1 uint8 elsewhere.
"""

import numpy as np
import pytest

from mmdyn_tpu.sim.camera import Camera
from mmdyn_tpu.sim.physics import AnalyticBackend
from mmdyn_tpu.sim.raycast_jax import RaycastJax, capture_scene


def _make_scene():
    be = AnalyticBackend()
    be.add_sphere(0.4, [0.3, -0.2, 0.8], color=(1, 0, 0))
    be.add_box([0.3, 0.2, 0.25], [-0.5, 0.3, 0.6],
               orientation=[0.2, 0.1, 0.3, 0.927], color=(0, 1, 0))
    be.add_box([0.2, 0.4, 0.1], [0.4, 0.6, 0.3], color=(0.2, 0.4, 0.9))
    return be


def _make_camera(be, eye=(0, 0, 3.0), target=(0, 0, 0)):
    cam = Camera(width=96, height=72, backend=be)
    cam.set_projection_matrix(fovy=60, aspect=96 / 72, near=0.3, far=8)
    cam.set_view_matrix(list(eye), list(target), [0, 1, 0])
    return cam


def _compare(host, dev, frame=0):
    rgb_h, depth_h, seg_h = host
    rgba_d = np.asarray(dev[0][frame])
    depth_d = np.asarray(dev[1][frame])
    seg_d = np.asarray(dev[2][frame])

    seg_h = np.asarray(seg_h)
    mismatch = seg_h != seg_d
    assert mismatch.mean() < 0.01, f"seg mismatch {mismatch.mean():.4f}"

    agree = ~mismatch
    np.testing.assert_allclose(depth_d[agree], np.asarray(depth_h)[agree],
                               atol=2e-4)
    diff = np.abs(np.asarray(rgb_h[..., :3], np.int32)
                  - rgba_d[..., :3].astype(np.int32))
    frac_gt1 = (diff[agree] > 1).mean()
    assert frac_gt1 < 0.005, f"rgb >1-uint8 fraction {frac_gt1:.4f}"
    assert (rgba_d[..., 3] == 255).all()


class TestRaycastParity:
    def test_static_scene_matches_host(self):
        be = _make_scene()
        cam = _make_camera(be)
        host = be.render(cam)

        sig, static, frame = capture_scene(be)
        rc = RaycastJax.from_camera(cam)
        m_inv, eye, fwd = RaycastJax.capture_camera_state(cam)
        cam_states = {"m_inv": m_inv[None], "eye": eye[None],
                      "forward": fwd[None]}
        scene = dict(static)
        scene["sph_pos"] = frame["sph_pos"][None]
        scene["box_pos"] = frame["box_pos"][None]
        scene["box_q"] = frame["box_q"][None]
        dev = rc.render_frames(cam_states, scene)
        _compare(host, dev)

    def test_moving_camera_and_bodies_batch(self):
        """Three frames with the camera orbiting and bodies displaced; every
        frame must match its own host render."""
        be = _make_scene()
        rc = None
        hosts, cams, frames = [], [], []
        for k, eye in enumerate([(0, 0, 3.0), (0.5, 0.4, 2.8),
                                 (-0.6, 0.2, 3.2)]):
            # displace the sphere + first box a little each frame
            be.bodies[1].position = np.array([0.3, -0.2, 0.8 - 0.1 * k])
            be.bodies[2].orientation = np.array(
                [0.2, 0.1 + 0.05 * k, 0.3, 0.927])
            cam = _make_camera(be, eye=eye)
            hosts.append(be.render(cam))
            cams.append(RaycastJax.capture_camera_state(cam))
            _, static, frame = capture_scene(be)
            frames.append(frame)
            if rc is None:
                rc = RaycastJax.from_camera(cam)
                base_static = static
        cam_states = {
            "m_inv": np.stack([c[0] for c in cams]),
            "eye": np.stack([c[1] for c in cams]),
            "forward": np.stack([c[2] for c in cams]),
        }
        scene = dict(base_static)
        scene["sph_pos"] = np.stack([f["sph_pos"] for f in frames])
        scene["box_pos"] = np.stack([f["box_pos"] for f in frames])
        scene["box_q"] = np.stack([f["box_q"] for f in frames])
        dev = rc.render_frames(cam_states, scene)
        for k, host in enumerate(hosts):
            _compare(host, dev, frame=k)

    def test_empty_categories(self):
        """Plane-only and no-plane scenes compile and render."""
        be = AnalyticBackend()
        cam = _make_camera(be, eye=(0, 0.5, 2.0))
        host = be.render(cam)
        _, static, frame = capture_scene(be)
        rc = RaycastJax.from_camera(cam)
        m_inv, eye, fwd = RaycastJax.capture_camera_state(cam)
        scene = dict(static)
        scene["sph_pos"] = frame["sph_pos"][None]
        scene["box_pos"] = frame["box_pos"][None]
        scene["box_q"] = frame["box_q"][None]
        dev = rc.render_frames({"m_inv": m_inv[None], "eye": eye[None],
                                "forward": fwd[None]}, scene)
        _compare(host, dev)
        assert (np.asarray(dev[2][0]) <= 0).all()  # plane or background only
