"""Shared helpers for the simulator data-collection CLIs."""

from __future__ import annotations

from pathlib import Path

import numpy as np


class DeferredTactile:
    """Batch tactile shading on the accelerator (``--device-render``).

    The reference shades every snapshot inline on the host — a per-frame
    NumPy Phong sum over 307k points (tact_sim/tactile/shader.py:78-129,
    sensor.py:415-445). With a deferred writer, ``snapshot`` only stores the
    clipped depth buffer plus the frame's camera/light state; at the end of
    the rollout ``flush()`` renders every tactile image in one batched jitted
    pass (sim/tactile_jax.py) and writes the PNGs. Output parity with the
    host pipeline is within 1 uint8 outside contact-edge pixels
    (tests/test_tactile_jax.py).

    Per-frame view matrices are captured, so a sensor that moves mid-rollout
    (the exp_3 shock) renders correctly.
    """

    def __init__(self, chunk=128):
        self.chunk = int(chunk)
        self._frames = []        # (depth, m_inv, eye, dirs, path, counter)
        self._renderer = None
        self._camera = None

    def add(self, sensor, depth_eq, path, img_counter):
        from mmdyn_tpu.sim.tactile_jax import TactileRendererJax

        if self._renderer is None:
            self._renderer = TactileRendererJax.cached_from_sensor(sensor)
            self._camera = sensor.camera
        m_inv, eye, dirs = TactileRendererJax.capture_frame_state(sensor)
        self._frames.append((np.asarray(depth_eq, np.float32), m_inv, eye,
                             dirs, Path(path), int(img_counter)))

    def __len__(self):
        return len(self._frames)

    def flush(self):
        """Render all pending frames (chunked) and write tactile PNGs.

        A static sensor (demo, exp_1, exp_2) takes the renderer's baked-
        matrix path, whose jit compiles ~5-10x faster through the remote
        compile service than the per-frame-matrix path; only a sensor that
        actually moved mid-rollout (the exp_3 shock) pays for the latter.
        """
        if not self._frames:
            return 0
        r = self._renderer
        static = all(
            np.array_equal(m, np.asarray(r._m_inv))
            and np.array_equal(e, np.asarray(r._eye))
            and np.array_equal(d, np.asarray(r._light_dirs)[:, :, 0])
            for _, m, e, d, _, _ in self._frames)
        n = 0
        for i in range(0, len(self._frames), self.chunk):
            group = self._frames[i:i + self.chunk]
            depths = np.stack([g[0] for g in group])
            if static:
                imgs = np.asarray(r(depths))
            else:
                imgs = np.asarray(r.render_frames(
                    depths, np.stack([g[1] for g in group]),
                    np.stack([g[2] for g in group]),
                    np.stack([g[3] for g in group])))
            for img, (_, _, _, _, path, counter) in zip(imgs, group):
                self._camera.save_image(img, path,
                                        title=f"tactile_{counter:04d}")
                n += 1
        self._frames.clear()
        return n


def snapshot(sensor, obj_id, path, img_counter, mask_seg_to_obj=True,
             debug=False, show_image=False, deferred=None):
    """One sensing snapshot: render, tactile-shade, dump PNGs.

    Mirrors the per-interval block of the reference experiment loops
    (exp_1_flat_plane.py:121-150). Returns (pose, contact_force). With
    ``deferred`` (a DeferredTactile), the host Phong shading is skipped and
    the frame's depth + camera state are queued for batched accelerator
    rendering at end of rollout.
    """
    rgb_img, rgb_eq, depth_eq, seg_img, seg_eq = sensor.get_sensor_image()
    seg_img = np.asarray(seg_img)
    if mask_seg_to_obj:
        seg_img = np.where(seg_img != obj_id, -1, obj_id)

    if deferred is not None:
        deferred.add(sensor, depth_eq, path, img_counter)
        tactile_img = None
    else:
        pointcloud = sensor.get_sensor_pointcloud(rgb_eq, depth_eq, mask=False)
        tactile_img = sensor.get_tactile_image(rgb_eq, depth_eq, pointcloud)

    pose = sensor.backend.get_pose(obj_id)
    force = sensor.contacts.total_force(obj_id) if sensor.contacts else 0.0

    path = Path(path)
    cam = sensor.camera
    cam.save_image(rgb_img, path, title=f"visual_{img_counter:04d}")
    if tactile_img is not None:
        cam.save_image(tactile_img, path, title=f"tactile_{img_counter:04d}")
    cam.save_image(seg_img, path, RGB=False, title=f"seg_{img_counter:04d}")
    cam.save_image(depth_eq, path, RGB=False, title=f"depth_{img_counter:04d}")

    if show_image:
        cam.show_image(rgb_img, title="Raw RGB", save=False)
        if tactile_img is not None:
            cam.show_image(tactile_img, title="Tactile RGB", save=False)
    return pose, force
