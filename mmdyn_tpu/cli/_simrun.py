"""Shared helpers for the simulator data-collection CLIs."""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax

from mmdyn_tpu.utils.wire import RunLengthWire, pack_rgb, unpack_rgb


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
        # hoist the renderer's baked device constants ONCE: each np.asarray
        # of a device array is a separate ~25-35 ms tunnel RPC, and this
        # check runs per queued frame (measured 13.7 s of a 20.7 s corpus)
        r_m_inv, r_eye = np.asarray(r._m_inv), np.asarray(r._eye)
        r_dirs = np.asarray(r._light_dirs)[:, :, 0]
        static = all(
            np.array_equal(m, r_m_inv)
            and np.array_equal(e, r_eye)
            and np.array_equal(d, r_dirs)
            for _, m, e, d, _, _ in self._frames)
        n = 0
        for i in range(0, len(self._frames), self.chunk):
            group = self._frames[i:i + self.chunk]
            # pad to a power-of-two bucket so all rollout lengths share a few
            # compiled programs (a fresh remote compile costs 25-300 s; the
            # padded frames cost one extra depth upload + ~1 ms compute)
            bucket = 1
            while bucket < len(group):
                bucket *= 2
            gp = group + [group[-1]] * (bucket - len(group))
            depths = np.stack([g[0] for g in gp])
            if static:
                imgs = np.asarray(r(depths)[:len(group)])
            else:
                imgs = np.asarray(r.render_frames(
                    depths, np.stack([g[1] for g in gp]),
                    np.stack([g[2] for g in gp]),
                    np.stack([g[3] for g in gp]))[:len(group)])
            for img, (_, _, _, _, path, counter) in zip(imgs, group):
                self._camera.save_image(img, path,
                                        title=f"tactile_{counter:04d}")
                n += 1
        self._frames.clear()
        return n


class DeferredFrames:
    """Fully device-side snapshot rendering (``--device-render`` on the
    analytic engine).

    ``DeferredTactile`` still pays one HOST raycast per snapshot (the visual
    RGB / depth / seg come from ``backend.render``, 38-90 ms/frame) and
    uploads each depth buffer to the accelerator. This class defers the
    raycast itself: ``add_snapshot`` stores only the frame's camera state and
    body poses (a few hundred bytes), and ``flush()`` renders visual RGB,
    depth, segmentation AND the tactile image for the whole rollout in
    batched jitted passes (sim/raycast_jax.py + sim/tactile_jax.py) — poses
    go up, finished uint8 images come down. Replaces the per-interval host
    block of the reference loops (exp_1_flat_plane.py:121-150,
    tact_sim/tactile/sensor.py:342-445) for ``use_force=False`` sensors on
    plane/sphere/box scenes (everything the analytic engine produces).

    Dump parity with the host path: seg exact, depth within one uint8
    quantum, RGB within the raycaster's contact-edge band
    (tests/test_tactile_jax.py::test_demo_device_render_dump_parity).
    """

    _rc_cache = {}

    def __init__(self, chunk=128):
        self.chunk = int(chunk)
        self._frames = []   # dicts per snapshot
        self._sensor = None
        self._tac = None
        self._rc = None
        self._wire = RunLengthWire()

    def __len__(self):
        return len(self._frames)

    def add_snapshot(self, sensor, obj_id, path, img_counter,
                     mask_seg_to_obj=True):
        """Capture the frame state; returns (pose, force) like the host path."""
        from mmdyn_tpu.sim.raycast_jax import RaycastJax, capture_scene
        from mmdyn_tpu.sim.tactile_jax import TactileRendererJax

        sensor._update_pose()
        sensor._update_sensor()
        sensor.refresh_contacts()

        if self._sensor is None:
            self._sensor = sensor
            self._tac = TactileRendererJax.cached_from_sensor(sensor)
            cam = sensor.camera
            key = (cam.width, cam.height, float(cam.near), float(cam.far))
            if key not in self._rc_cache:
                self._rc_cache[key] = RaycastJax.from_camera(cam)
            self._rc = self._rc_cache[key]

        m_inv, eye, fwd = RaycastJax.capture_camera_state(sensor.camera)
        t_m_inv, t_eye, t_dirs = TactileRendererJax.capture_frame_state(sensor)
        sig, static, frame = capture_scene(sensor.backend)
        self._frames.append({
            "cam": (m_inv, eye, fwd), "tac": (t_m_inv, t_eye, t_dirs),
            "sig": sig, "static": static, "frame": frame,
            "path": Path(path), "counter": int(img_counter),
            "obj_id": int(obj_id), "mask": bool(mask_seg_to_obj),
        })

        pose = sensor.backend.get_pose(obj_id)
        force = sensor.contacts.total_force(obj_id) if sensor.contacts else 0.0
        return pose, force

    def flush(self):
        """Render and write every queued snapshot's four PNGs.

        Everything crossing the device link is packed to its final uint8 PNG
        payload ON DEVICE (render_frames_packed) — the tunnel between this
        host and the TPU is bandwidth-bound, and the clipped f32 depth feeds
        the tactile pass as a device array without ever visiting the host.
        """
        import cv2

        if not self._frames:
            return 0
        n = 0
        # consecutive same-(signature, mask) runs share one compiled call
        key = lambda f: (f["sig"], f["mask"])
        groups, cur = [], [self._frames[0]]
        for f in self._frames[1:]:
            if key(f) == key(cur[0]):
                cur.append(f)
            else:
                groups.append(cur)
                cur = [f]
        groups.append(cur)

        mbd = float(self._sensor.max_buffer_depth)
        # hoist the tactile renderer's baked device constants once (each
        # np.asarray of a device array is a ~25-35 ms tunnel RPC; the
        # static-camera check below runs per queued frame)
        r = self._tac
        r_m_inv, r_eye = np.asarray(r._m_inv), np.asarray(r._eye)
        r_dirs = np.asarray(r._light_dirs)[:, :, 0]
        for group in groups:
            for i in range(0, len(group), self.chunk):
                g = group[i:i + self.chunk]
                # pad the batch to a power-of-two bucket so every rollout
                # length shares a handful of compiled programs: a fresh
                # compile costs 25-300 s through the tunnel, rendering a
                # padded frame ~1 ms. Padded rows repeat the last frame and
                # are sliced off ON DEVICE before download, so they never
                # cross the tunnel.
                n_real = len(g)
                bucket = 1
                while bucket < n_real:
                    bucket *= 2
                pad = [g[-1]] * (bucket - n_real)
                gp = g + pad
                cam_states = {
                    "m_inv": np.stack([f["cam"][0] for f in gp]),
                    "eye": np.stack([f["cam"][1] for f in gp]),
                    "forward": np.stack([f["cam"][2] for f in gp]),
                }
                scene = dict(g[0]["static"])
                for k in ("sph_pos", "box_pos", "box_q"):
                    scene[k] = np.stack([f["frame"][k] for f in gp])
                rgb, depth_clip, depth_png, seg_png = \
                    self._rc.render_frames_packed(
                        cam_states, scene, mbd,
                        np.array([f["obj_id"] for f in gp]),
                        mask=g[0]["mask"])

                static_cam = all(
                    np.array_equal(f["tac"][0], r_m_inv)
                    and np.array_equal(f["tac"][1], r_eye)
                    and np.array_equal(f["tac"][2], r_dirs)
                    for f in g)
                # depth_clip stays bucket-padded so the tactile pass shares
                # the same few compiled shapes
                if static_cam:
                    tactile = r(depth_clip)
                else:
                    tactile = r.render_frames(
                        depth_clip, np.stack([f["tac"][0] for f in gp]),
                        np.stack([f["tac"][1] for f in gp]),
                        np.stack([f["tac"][2] for f in gp]))

                # the tunnel is link-capped at ~28 MB/s (utils/wire.py), so
                # the chunk's four payloads cross it RUN-LENGTH-ENCODED on
                # device (~100-200x smaller for these scenes, bit-exact, raw
                # fallback inside wire.get); padded rows compress to a few
                # runs and are dropped on the host
                import jax.numpy as jnp
                h, wd = rgb.shape[1], rgb.shape[2]
                handle = self._wire.encode(
                    [pack_rgb(rgb), pack_rgb(tactile),
                     depth_png.astype(jnp.uint32).reshape(bucket, -1),
                     seg_png.astype(jnp.uint32).reshape(bucket, -1)],
                    row_len=h * wd)
                vis_p, tac_p, dep_p, seg_p = self._wire.get(handle)
                rgb = unpack_rgb(vis_p, h, wd)[:n_real]
                tactile = unpack_rgb(tac_p, h, wd)[:n_real]
                depth_png = dep_p.reshape(bucket, h, wd).astype(
                    np.uint8)[:n_real]
                seg_png = seg_p.reshape(bucket, h, wd).astype(
                    np.uint8)[:n_real]
                for j, f in enumerate(g):
                    f["path"].mkdir(parents=True, exist_ok=True)
                    c = f["counter"]
                    cv2.imwrite(str(f["path"] / f"visual_{c:04d}.png"),
                                cv2.cvtColor(rgb[j], cv2.COLOR_RGB2BGR))
                    cv2.imwrite(str(f["path"] / f"tactile_{c:04d}.png"),
                                cv2.cvtColor(tactile[j], cv2.COLOR_RGB2BGR))
                    cv2.imwrite(str(f["path"] / f"seg_{c:04d}.png"),
                                seg_png[j])
                    cv2.imwrite(str(f["path"] / f"depth_{c:04d}.png"),
                                depth_png[j])
                    n += 1
        self._frames.clear()
        return n


def make_deferred(sensor):
    """The deepest device-side deferral this sensor/backend supports:
    full-frame rendering on the analytic engine (no equilibrium buffer),
    tactile-only shading otherwise."""
    from mmdyn_tpu.sim.physics import AnalyticBackend

    if (isinstance(sensor.backend, AnalyticBackend)
            and not getattr(sensor, "_use_force", False)):
        return DeferredFrames()
    return DeferredTactile()


def snapshot(sensor, obj_id, path, img_counter, mask_seg_to_obj=True,
             debug=False, show_image=False, deferred=None):
    """One sensing snapshot: render, tactile-shade, dump PNGs.

    Mirrors the per-interval block of the reference experiment loops
    (exp_1_flat_plane.py:121-150). Returns (pose, contact_force). With
    ``deferred`` (a DeferredTactile), the host Phong shading is skipped and
    the frame's depth + camera state are queued for batched accelerator
    rendering at end of rollout; a DeferredFrames defers the raycast too
    (nothing is rendered on the host, ``show_image`` is unavailable).
    """
    if isinstance(deferred, DeferredFrames):
        return deferred.add_snapshot(sensor, obj_id, path, img_counter,
                                     mask_seg_to_obj=mask_seg_to_obj)
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
