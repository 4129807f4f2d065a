"""Shared helpers for the simulator data-collection CLIs."""

from __future__ import annotations

import os
import time
from pathlib import Path

import numpy as np

import jax

from mmdyn_tpu.utils.wire import RunLengthWire, pack_rgb, unpack_rgb

_TRACE = os.environ.get("MMDYN_GEN_TRACE", "") not in ("", "0")


class _StageClock:
    """Opt-in (MMDYN_GEN_TRACE=1) wall-clock attribution for the generation
    pipeline; stderr one-liner per flush/rollout."""

    def __init__(self):
        self.t = time.perf_counter()
        self.stages = {}

    def mark(self, name):
        now = time.perf_counter()
        self.stages[name] = self.stages.get(name, 0.0) + (now - self.t)
        self.t = now

    def report(self, label):
        import sys
        total = sum(self.stages.values())
        parts = " ".join(f"{k}={v:.2f}s" for k, v in self.stages.items())
        print(f"# gen-trace {label}: total={total:.2f}s {parts}",
              file=sys.stderr)


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

    def _dispatch_chunk(self, g, mbd, tac_static):
        """Queue one chunk's full device pipeline (raycast -> tactile ->
        RLE encode); returns a drain token. Nothing is downloaded here.

        The batch is padded to a power-of-two bucket so every rollout
        length shares a handful of compiled programs (a fresh compile costs
        25-300 s through the tunnel); padded rows repeat the last frame,
        compress to a few runs on the wire, and are dropped on the host.
        """
        import jax.numpy as jnp

        r_m_inv, r_eye, r_dirs = tac_static
        n_real = len(g)
        bucket = 1
        while bucket < n_real:
            bucket *= 2
        gp = g + [g[-1]] * (bucket - n_real)
        cam_states = {
            "m_inv": np.stack([f["cam"][0] for f in gp]),
            "eye": np.stack([f["cam"][1] for f in gp]),
            "forward": np.stack([f["cam"][2] for f in gp]),
        }
        scene = dict(g[0]["static"])
        for k in ("sph_pos", "box_pos", "box_q"):
            scene[k] = np.stack([f["frame"][k] for f in gp])
        rgb, depth_clip, depth_png, seg_png = self._rc.render_frames_packed(
            cam_states, scene, mbd, np.array([f["obj_id"] for f in gp]),
            mask=g[0]["mask"])

        static_cam = all(
            np.array_equal(f["tac"][0], r_m_inv)
            and np.array_equal(f["tac"][1], r_eye)
            and np.array_equal(f["tac"][2], r_dirs)
            for f in g)
        # depth_clip stays bucket-padded so the tactile pass shares the
        # same few compiled shapes
        if static_cam:
            tactile = self._tac(depth_clip)
        else:
            tactile = self._tac.render_frames(
                depth_clip, np.stack([f["tac"][0] for f in gp]),
                np.stack([f["tac"][1] for f in gp]),
                np.stack([f["tac"][2] for f in gp]))

        # the tunnel is link-capped at ~28 MB/s (utils/wire.py), so the
        # chunk's four payloads cross it RUN-LENGTH-ENCODED on device
        # (bit-exact; raw fallback inside wire.get). depth rides visual's
        # unused 4th value byte and seg rides tactile's: the RLE encode's
        # cost is per ELEMENT (the scatter), so folding payloads into spare
        # bytes halves the encode for a few percent more runs. Row breaks
        # at the image row (wd < 2^16) keep run lengths in uint16.
        h, wd = rgb.shape[1], rgb.shape[2]
        s0 = pack_rgb(rgb) | (depth_png.astype(jnp.uint32).reshape(
            bucket, -1) << 24)
        s1 = pack_rgb(tactile) | (seg_png.astype(jnp.uint32).reshape(
            bucket, -1) << 24)
        handle = self._wire.encode([s0, s1], row_len=wd, planes=4)
        return {"g": g, "handle": handle, "h": h, "w": wd, "bucket": bucket}

    def _download_chunk(self, token, clock=None):
        """Download one dispatched chunk's wire payload (no decode)."""
        raw = self._wire.get_raw(token["handle"])
        if clock is not None:
            clock.mark("wire")
        return raw

    def _write_chunk(self, token, raw):
        """Hand decode (plane-wise run expansion) + PNG writes to the
        background writer; overlaps the NEXT chunk's device encode."""
        g, h, wd = token["g"], token["h"], token["w"]
        bucket = token["bucket"]

        def write():
            import cv2
            if "fallback" in raw:
                s0, s1 = RunLengthWire.decode(raw)
                vis = unpack_rgb(s0 & 0xFFFFFF, h, wd)[..., ::-1]    # BGR
                tac = unpack_rgb(s1 & 0xFFFFFF, h, wd)[..., ::-1]
                dep = (s0 >> 24).reshape(bucket, h, wd).astype(np.uint8)
                seg = (s1 >> 24).reshape(bucket, h, wd).astype(np.uint8)
                planes = None
            else:
                # expand byte planes directly (no uint32 round-trip):
                # stream 0 = visual rgb + depth in byte 3, stream 1 =
                # tactile rgb + seg in byte 3
                (a0, b0), (a1, b1) = RunLengthWire.run_bounds(raw)
                le = raw["lengths"]
                sh = (bucket, h, wd)
                rep = lambda v, a, b: np.repeat(v[a:b], le[a:b]).reshape(sh)
                planes = {
                    "vis": [rep(raw[k], a0, b0) for k in ("v2", "v1", "v0")],
                    "tac": [rep(raw[k], a1, b1) for k in ("v2", "v1", "v0")],
                }
                dep = rep(raw["v3"], a0, b0)
                seg = rep(raw["v3"], a1, b1)
            for j, f in enumerate(g):
                f["path"].mkdir(parents=True, exist_ok=True)
                c = f["counter"]
                if planes is None:
                    vj = np.ascontiguousarray(vis[j])
                    tj = np.ascontiguousarray(tac[j])
                else:
                    # merge is BGR order (v2=b, v1=g, v0=r)
                    vj = cv2.merge([p[j] for p in planes["vis"]])
                    tj = cv2.merge([p[j] for p in planes["tac"]])
                cv2.imwrite(str(f["path"] / f"visual_{c:04d}.png"), vj)
                cv2.imwrite(str(f["path"] / f"tactile_{c:04d}.png"), tj)
                cv2.imwrite(str(f["path"] / f"seg_{c:04d}.png"), seg[j])
                cv2.imwrite(str(f["path"] / f"depth_{c:04d}.png"), dep[j])

        self._submit_write(write)
        return len(g)

    def _submit_write(self, fn):
        """One background writer, one queued job max (bounds host memory)."""
        import queue
        import threading
        if getattr(self, "_writer", None) is None:
            self._wq = queue.Queue(maxsize=1)

            def loop():
                while True:
                    job = self._wq.get()
                    if job is None:
                        break
                    try:
                        job()
                    except BaseException as e:   # surface on join
                        self._werr = e
                    self._wq.task_done()

            self._werr = None
            self._writer = threading.Thread(target=loop, daemon=True)
            self._writer.start()
        self._wq.put(fn)

    def _join_writes(self):
        if getattr(self, "_writer", None) is not None:
            self._wq.join()
            if self._werr is not None:
                err, self._werr = self._werr, None
                raise err

    def flush(self):
        """Render and write every queued snapshot's four PNGs.

        Everything crossing the device link is packed to its final uint8
        payload ON DEVICE (render_frames_packed + the RLE wire), and chunks
        run as a 1-deep pipeline: chunk k+1's render/encode is dispatched
        BEFORE chunk k's wire download + host PNG writes, so device compute
        and host IO overlap (the queue depth is bounded at one in-flight
        chunk to cap HBM held by encode buffers).
        """
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
        # static-camera check runs per queued frame)
        r = self._tac
        tac_static = (np.asarray(r._m_inv), np.asarray(r._eye),
                      np.asarray(r._light_dirs)[:, :, 0])
        clock = _StageClock() if _TRACE else None
        # STRICT serial DEVICE order (download k before dispatching k+1):
        # the tunnel serialises transfers against queued device compute,
        # and a download issued while the next chunk's encode runs drops
        # from ~44 MB/s to ~7 MB/s (measured) — worse than no overlap at
        # all. The n_runs readback inside wire.get_raw already waits out
        # the encode, so the download always rides an idle link. Decode
        # (plane-wise run expansion) + PNG encode + disk IO happen in the
        # background writer, overlapping the NEXT chunk's device encode.
        chunks = [group[i:i + self.chunk] for group in groups
                  for i in range(0, len(group), self.chunk)]
        token = self._dispatch_chunk(chunks[0], mbd, tac_static)
        for nxt in chunks[1:]:
            raw = self._download_chunk(token, clock)
            token_next = self._dispatch_chunk(nxt, mbd, tac_static)
            if clock is not None:
                clock.mark("dispatch")
            n += self._write_chunk(token, raw)
            token = token_next
        raw = self._download_chunk(token, clock)
        n += self._write_chunk(token, raw)
        self._join_writes()
        if clock is not None:
            clock.mark("png-join")
            clock.report(f"flush[{n} frames]")
        self._frames.clear()
        return n


def run_trials_device_physics(backend, sensor, obj_id, trial_states,
                              n_timesteps, interval, paths, snapshot_from=0,
                              ext_forces=None, mask_seg_to_obj=True,
                              blank_guard=True):
    """Run K independent trials of ONE analytic scene entirely on device.

    Replaces the host stepping loop of the experiment CLIs
    (exp_1_flat_plane.py:136-145 and friends): the leapfrog + impulse
    contact stepping runs as one vmapped ``lax.scan``
    (sim/physics_jax.SimulatorJax) over all K trials, the per-snapshot
    frames render through the packed device pipeline (DeferredFrames:
    raycast + tactile + RLE wire), and only poses/forces + the finished
    PNG payloads ever cross the tunnel.

    Args:
        trial_states: per trial, a dict {body_id: (position, orientation)}
            of pose overrides applied before the rollout (set_pose
            semantics: velocity zeroed — set_pose zeroes it for every body
            anyway at trial start since each trial restarts the scene).
        ext_forces: optional (K, T, NB, 3) world-frame forces in BODY-ROW
            order (rows = ascending body id), pybullet applyExternalForce
            one-step semantics.
        blank_guard: replicate the experiments' first-frame check — a trial
            whose initial raw segmentation is empty is skipped (returns
            None for it), exp_1_flat_plane.py:124-129.

    Returns a list of per-trial dicts (or None for blank-skipped trials)
    with keys time_step / time / position / orientation / force, where
    force is the sensor<->object total normal force at each snapshot (the
    Contact.total_force semantics, sim/contact.py).
    """
    import jax.numpy as jnp

    from mmdyn_tpu.sim import config as sim_config
    from mmdyn_tpu.sim.physics_jax import pack_scene
    from mmdyn_tpu.sim.raycast_jax import RaycastJax, capture_scene

    k_trials = len(trial_states)
    clock = _StageClock() if _TRACE else None
    sim, ids, consts = pack_scene(backend)
    row = {bid: r for r, bid in enumerate(ids)}
    nb = len(ids)

    pos = np.tile(consts["pos"][None], (k_trials, 1, 1))
    quat = np.tile(consts["quat"][None], (k_trials, 1, 1))
    for k, overrides in enumerate(trial_states):
        for bid, (p, q) in overrides.items():
            pos[k, row[bid]] = np.asarray(p, np.float64)
            quat[k, row[bid]] = np.asarray(q, np.float64)
    vel = np.zeros_like(pos)
    sizes = np.tile(consts["sizes"][None], (k_trials, 1, 1))
    mass = np.tile(consts["mass"][None], (k_trials, 1))

    # --- blank guard: initial raw seg, blankness reduced ON device --------
    sensor._update_pose()
    sensor._update_sensor()
    sig, static, _ = capture_scene(backend)
    sph_rows = [row[int(i)] for i in static["sph_id"]]
    box_rows = [row[int(i)] for i in static["box_id"]]

    def scene_frames(p_btc, q_btc):
        """Per-frame raycast arrays from (F, NB, 3)/(F, NB, 4) body states."""
        s = dict(static)
        s["sph_pos"] = p_btc[:, sph_rows].astype(np.float32)
        s["box_pos"] = p_btc[:, box_rows].astype(np.float32)
        s["box_q"] = q_btc[:, box_rows].astype(np.float32)
        return s

    skip = [False] * k_trials
    if blank_guard:
        cam = sensor.camera
        key = (cam.width, cam.height, float(cam.near), float(cam.far))
        rc = DeferredFrames._rc_cache.setdefault(key,
                                                 RaycastJax.from_camera(cam))
        m_inv, eye, fwd = RaycastJax.capture_camera_state(cam)
        cam_states = {"m_inv": np.stack([m_inv] * k_trials),
                      "eye": np.stack([eye] * k_trials),
                      "forward": np.stack([fwd] * k_trials)}
        _, _, seg0 = rc.render_frames(cam_states, scene_frames(pos, quat))
        skip = [bool(x) for x in
                np.asarray(jnp.all(seg0 == -1, axis=(1, 2)))]

    if clock is not None:
        clock.mark("blank-guard")
    # --- the whole rollout batch in one jitted call ------------------------
    out = sim.simulate(pos, vel, quat, sizes, mass, int(n_timesteps),
                       ext_forces=ext_forces)
    traj, cf = jax.device_get((out["pos"], out["contact_force"]))
    if clock is not None:
        clock.mark("simulate")

    # sensor<->object pair force (Contact.total_force drops ground contacts)
    force_series = np.zeros((k_trials, int(n_timesteps)), np.float64)
    sensor_row, obj_row = row[sensor.sensor_id], row[obj_id]
    if backend.bodies[sensor.sensor_id].shape == "box":
        force_series += cf[:, :, obj_row, sim.support_slot(sensor_row)]
    if backend.bodies[obj_id].shape == "box":
        force_series += cf[:, :, sensor_row, sim.support_slot(obj_row)]

    snap_ts = [t for t in range(int(n_timesteps))
               if (t + 1) % int(interval) == 0 and t >= int(snapshot_from)]

    deferred = DeferredFrames()
    results = []
    for k in range(k_trials):
        if skip[k]:
            results.append(None)
            continue
        data = {"time_step": [], "time": [], "position": [],
                "orientation": [], "force": []}
        # immovable bodies keep their per-trial override for the whole
        # rollout (e.g. exp_2's inclined fixed sensor)
        for bid, (p, q) in trial_states[k].items():
            if not sim.movable[row[bid]]:
                backend.set_pose(bid, p, q)
        for c, t in enumerate(snap_ts):
            # replay the simulated state into the host backend so the
            # existing capture machinery (camera follows a movable sensor,
            # scene snapshot) sees exactly the step-t world
            for bid in ids:
                r = row[bid]
                if sim.movable[r]:
                    backend.set_pose(bid, traj[k, t, r], quat[k, r])
            deferred.add_snapshot(sensor, obj_id, paths[k], c,
                                  mask_seg_to_obj=mask_seg_to_obj)
            p, q = backend.get_pose(obj_id)
            data["time_step"].append(t)
            data["time"].append(t * getattr(backend, "time_step",
                                            sim_config.TIME_STEP))
            data["position"].append([float(x) for x in p])
            data["orientation"].append([float(x) for x in q])
            # a snapshot at iteration t reads the contacts of step t-1
            # (the loops snapshot BEFORE backend.step())
            data["force"].append(float(force_series[k, t - 1])
                                 if t > 0 else 0.0)
        results.append(data)
    if clock is not None:
        clock.mark("capture")
        clock.report(f"rollout[{k_trials} trials x {n_timesteps} steps]")
    deferred.flush()
    return results


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
