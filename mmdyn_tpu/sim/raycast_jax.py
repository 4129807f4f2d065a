"""Batched on-device analytic raycasting (JAX).

``AnalyticBackend.render`` raycasts one frame at a time on the host (numpy,
38-40 ms/frame at 640x480 — docs/PARITY.md data-generation table). For the
plane/sphere/box scenes every experiment CLI generates, the visual RGB, the
depth buffer, AND the segmentation are pure functions of (camera state, body
states), so whole rollouts batch onto the accelerator:

    rc = RaycastJax.from_camera(camera)
    rgb, depth, seg = rc.render_frames(scene_static, frame_states)

Combined with ``TactileRendererJax`` (which consumes the clipped depth
buffer) this closes the loop on a fully device-side frame pipeline: per
snapshot only the BODY POSES go up (a few hundred bytes) and the finished
uint8 images come down — the per-frame 1.2 MB depth upload of the
tactile-only path disappears.

Numerics mirror ``sim/physics.AnalyticBackend`` (render: physics.py::render,
_ray_plane/_ray_sphere/_ray_box) in float32: same ray grid from the inverse
view-projection, same body-id-ordered strictly-closer hit resolution, the
same Lambert headlight term, the same eye-space -> buffer depth conversion
(camera.real_depth_to_buffer). Parity: tests/test_raycast_jax.py.

Mosaic compile note: the tiny per-frame quantities (m_inv, eye, forward,
body positions/quaternions) are consumed as SCALAR reads of traced arrays,
with all math on (H, W) per-component grids — small traced-tensor einsums
make the vmapped compile take minutes (see sim/tactile_jax.py's measured
note); scalar reads compile in seconds with identical arithmetic.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# the AnalyticBackend's fixed headlight (physics.py::render)
_LIGHT = np.array([0.3, 0.2, 0.93])
_LIGHT = _LIGHT / np.linalg.norm(_LIGHT)


def _quat_rot_scalars(q, b):
    """Rotation-matrix entries of box ``b``'s xyzw quaternion as 9 scalars."""
    x, y, z, w = q[b, 0], q[b, 1], q[b, 2], q[b, 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-30), 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return ((1.0 - (yy + zz), xy - wz, xz + wy),
            (xy + wz, 1.0 - (xx + zz), yz - wx),
            (xz - wy, yz + wx, 1.0 - (xx + yy)))


class RaycastJax:
    """Batched plane/sphere/box raycaster matching AnalyticBackend.render.

    Construction bakes the camera intrinsics (width/height/near/far and the
    projection-matrix entries driving the depth-buffer conversion); per-frame
    extrinsics (inverse view-projection, eye, forward) and body states are
    traced arguments, so one compiled renderer serves a moving sensor and
    any number of trials whose scenes share a (n_spheres, n_boxes,
    has_plane) signature.
    """

    def __init__(self, width, height, near, far, proj_a, proj_b):
        self._width, self._height = int(width), int(height)
        self._near, self._far = float(near), float(far)
        self._proj_a, self._proj_b = float(proj_a), float(proj_b)
# the pixel grid is generated inside the traced function (broadcasted_iota)
        # rather than closed over as a (H, W) device constant: embedded 1.2 MB
        # constants must be downloaded through the tunnel at every process's
        # first lowering and bloat the serialized HLO the compile cache ships
        self._render = jax.jit(self._render_batch,
                               static_argnames=("has_plane",))
        self._render_packed = jax.jit(self._render_packed_batch,
                                      static_argnames=("has_plane", "mask"))

    @classmethod
    def from_camera(cls, camera):
        proj = np.asarray(camera.projection_matrix, np.float64)
        return cls(camera.width, camera.height, camera.near, camera.far,
                   proj[2, 2], proj[2, 3])

    # camera-state capture (host, tiny) -------------------------------------

    @staticmethod
    def capture_camera_state(camera):
        """(m_inv, eye, forward) float32 numpy snapshot of the current pose."""
        m = np.matmul(np.asarray(camera.projection_matrix),
                      np.asarray(camera.view_matrix))
        eye = np.asarray(camera.camera_eye_position, np.float64)
        fwd = np.asarray(camera.camera_target_position, np.float64) - eye
        fwd = fwd / np.linalg.norm(fwd)
        return (np.linalg.inv(m).astype(np.float32),
                eye.astype(np.float32), fwd.astype(np.float32))

    # per-frame math ---------------------------------------------------------

    def _rays(self, m_inv, eye):
        """Unit ray directions through every pixel of the near plane, as 3
        (H, W) component grids (the _ray_grid math, physics.py:255-280)."""
        shape = (self._height, self._width)
        xm = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
        ym = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        x_ndc = 2.0 * xm / self._width - 1.0
        y_ndc = 2.0 * ym / self._height - 1.0
        ones = jnp.ones_like(x_ndc)
        pc = (x_ndc, y_ndc, -ones, ones)  # window z = near -> ndc z = -1
        world = [sum(m_inv[i, j] * pc[j] for j in range(4)) for i in range(4)]
        pt = [world[c] / world[3] for c in range(3)]
        d = [pt[c] - eye[c] for c in range(3)]
        norm = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
        return [c / norm for c in d]

    def _render_one(self, m_inv, eye, forward, sph_pos, sph_r, sph_col,
                    sph_id, box_pos, box_q, box_he, box_col, box_id,
                    plane_col, has_plane):
        d = self._rays(m_inv, eye)
        inf = jnp.float32(np.inf)
        t_best = jnp.full_like(d[0], inf)
        seg = jnp.full(d[0].shape, -1, jnp.int32)
        rgb = [jnp.zeros_like(d[0]) for _ in range(3)]

        def shade(col_r, col_g, col_b, n):
            lam = 0.35 + 0.65 * jnp.clip(
                n[0] * _LIGHT[0] + n[1] * _LIGHT[1] + n[2] * _LIGHT[2],
                0.0, 1.0)
            return (col_r * lam, col_g * lam, col_b * lam)

        def update(t, bid, shaded, t_best, seg, rgb):
            closer = t < t_best
            seg = jnp.where(closer, bid, seg)
            rgb = [jnp.where(closer, s, c) for s, c in zip(shaded, rgb)]
            return jnp.minimum(t, t_best), seg, rgb

        # bodies in ascending id order = the host's strictly-closer-wins
        # iteration (plane is always id 0 in AnalyticBackend)
        if has_plane:
            t = jnp.where(jnp.abs(d[2]) > 1e-9, -eye[2] / d[2], inf)
            t = jnp.where(t > 1e-9, t, inf)
            n = (jnp.zeros_like(t), jnp.zeros_like(t), jnp.ones_like(t))
            t_best, seg, rgb = update(
                t, jnp.int32(0),
                shade(plane_col[0], plane_col[1], plane_col[2], n),
                t_best, seg, rgb)

        for s in range(sph_r.shape[0]):
            oc = [eye[c] - sph_pos[s, c] for c in range(3)]
            b_half = oc[0] * d[0] + oc[1] * d[1] + oc[2] * d[2]
            oc2 = oc[0] * oc[0] + oc[1] * oc[1] + oc[2] * oc[2]
            disc = b_half * b_half - (oc2 - sph_r[s] * sph_r[s])
            t = jnp.where(disc >= 0,
                          -b_half - jnp.sqrt(jnp.maximum(disc, 0.0)), inf)
            t = jnp.where(t > 1e-9, t, inf)
            n = [oc[c] + d[c] * t for c in range(3)]
            nn = jnp.sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
            safe = jnp.maximum(jnp.where(jnp.isfinite(nn), nn, 1.0), 1e-30)
            n = [jnp.where(jnp.isfinite(nn), c / safe, 0.0) for c in n]
            t_best, seg, rgb = update(
                t, sph_id[s],
                shade(sph_col[s, 0], sph_col[s, 1], sph_col[s, 2], n),
                t_best, seg, rgb)

        for b in range(box_he.shape[0]):
            rot = _quat_rot_scalars(box_q, b)
            rel = [eye[c] - box_pos[b, c] for c in range(3)]
            # box frame: o = R^T rel, dl = R^T d
            o = [sum(rot[r][c] * rel[r] for r in range(3)) for c in range(3)]
            dl = [sum(rot[r][c] * d[r] for r in range(3)) for c in range(3)]
            tmin = jnp.full_like(d[0], -inf)
            tmax = jnp.full_like(d[0], inf)
            for c in range(3):
                invc = jnp.where(jnp.abs(dl[c]) > 1e-12, 1.0 / dl[c], inf)
                ta = (-box_he[b, c] - o[c]) * invc
                tb = (box_he[b, c] - o[c]) * invc
                tmin = jnp.maximum(tmin, jnp.minimum(ta, tb))
                tmax = jnp.minimum(tmax, jnp.maximum(ta, tb))
            t = jnp.where((tmax >= tmin) & (tmax > 0),
                          jnp.where(tmin > 1e-9, tmin, inf), inf)
            tl = jnp.where(jnp.isfinite(t), t, 0.0)
            pl = [o[c] + dl[c] * tl for c in range(3)]
            ratio = [jnp.abs(pl[c]) / box_he[b, c] for c in range(3)]
            # face with the largest |coordinate|/extent is the hit face
            m01 = ratio[0] >= ratio[1]
            mx = jnp.where(m01, ratio[0], ratio[1])
            face_is_z = ratio[2] > mx
            nl = [jnp.where(face_is_z, 0.0,
                            jnp.where(m01,
                                      jnp.sign(pl[0]) * (1.0 if c == 0 else 0.0),
                                      jnp.sign(pl[1]) * (1.0 if c == 1 else 0.0)))
                  if c < 2 else
                  jnp.where(face_is_z, jnp.sign(pl[2]), 0.0)
                  for c in range(3)]
            n = [sum(rot[r][c] * nl[c] for c in range(3)) for r in range(3)]
            t_best, seg, rgb = update(
                t, box_id[b],
                shade(box_col[b, 0], box_col[b, 1], box_col[b, 2], n),
                t_best, seg, rgb)

        hit = jnp.isfinite(t_best)
        ddotf = d[0] * forward[0] + d[1] * forward[1] + d[2] * forward[2]
        z_e = jnp.where(hit, t_best * ddotf, self._far)
        z_e = jnp.clip(z_e, self._near, self._far)
        depth = 0.5 * (-self._proj_a + self._proj_b / z_e) + 0.5
        rgba = jnp.stack(
            [jnp.clip(c, 0.0, 1.0) * 255.0 for c in rgb]
            + [jnp.full_like(rgb[0], 255.0)], axis=-1).astype(jnp.uint8)
        return rgba, depth, seg

    def _render_batch(self, m_inv, eye, forward, sph_pos, sph_r, sph_col,
                      sph_id, box_pos, box_q, box_he, box_col, box_id,
                      plane_col, has_plane):
        return jax.vmap(
            lambda mi, e, f, sp, bp, bq: self._render_one(
                mi, e, f, sp, sph_r, sph_col, sph_id, bp, bq, box_he,
                box_col, box_id, plane_col, has_plane)
        )(m_inv, eye, forward, sph_pos, box_pos, box_q)

    def _render_packed_batch(self, m_inv, eye, forward, sph_pos, sph_r,
                             sph_col, sph_id, box_pos, box_q, box_he, box_col,
                             box_id, plane_col, mbd, obj_ids, has_plane,
                             mask):
        """Render + PNG-pack in ONE compiled program (the --device-render
        dump path). The tunnel is bandwidth-bound (~20 MB/s), so everything
        crossing it is packed to its final uint8 PNG payload on device:

        * rgb: the visual PNG bytes (alpha dropped);
        * depth_png: the camera.save_image quantisation ``(d * 255) -> u8``
          of the max_buffer_depth-CLIPPED buffer (sensor.py:305-306);
        * seg_png: the object-masked segmentation after save_image's
          ``(seg * 255) -> u8`` wrap (-1 -> 1, id k -> (-k) mod 256);
        * depth_clip: full-precision clipped buffer, returned as a DEVICE
          array to feed TactileRendererJax without a host round-trip.
        """
        rgba, depth, seg = self._render_batch(
            m_inv, eye, forward, sph_pos, sph_r, sph_col, sph_id, box_pos,
            box_q, box_he, box_col, box_id, plane_col, has_plane)
        depth_clip = jnp.minimum(depth, mbd)
        depth_png = (depth_clip * 255.0).astype(jnp.uint8)
        if mask:
            oid = obj_ids[:, None, None]
            seg = jnp.where(seg != oid, jnp.int32(-1), oid)
        seg_png = (seg * 255).astype(jnp.uint8)
        return rgba[..., :3], depth_clip, depth_png, seg_png

    def render_frames_packed(self, cam_states, scene, max_buffer_depth,
                             obj_ids, mask=True):
        """Like ``render_frames`` but returns PNG-ready payloads:
        (rgb u8, depth_clip f32 device array, depth_png u8, seg_png u8)."""
        f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
        i32 = lambda a: jnp.asarray(np.asarray(a), jnp.int32)
        return self._render_packed(
            f32(cam_states["m_inv"]), f32(cam_states["eye"]),
            f32(cam_states["forward"]),
            f32(scene["sph_pos"]), f32(scene["sph_r"]), f32(scene["sph_col"]),
            i32(scene["sph_id"]),
            f32(scene["box_pos"]), f32(scene["box_q"]), f32(scene["box_he"]),
            f32(scene["box_col"]), i32(scene["box_id"]),
            f32(scene["plane_col"]), jnp.float32(max_buffer_depth),
            i32(obj_ids), has_plane=bool(scene["has_plane"]),
            mask=bool(mask))

    def render_frames(self, cam_states, scene):
        """Render a batch of frames.

        Args:
            cam_states: dict with 'm_inv' (F, 4, 4), 'eye' (F, 3),
                'forward' (F, 3) — from ``capture_camera_state`` per frame.
            scene: dict with static-per-group arrays 'sph_r' (S,), 'sph_col'
                (S, 3), 'sph_id' (S,), 'box_he' (B, 3), 'box_col' (B, 3),
                'box_id' (B,), 'plane_col' (3,), 'has_plane' (bool) and
                per-frame arrays 'sph_pos' (F, S, 3), 'box_pos' (F, B, 3),
                'box_q' (F, B, 4).

        Returns:
            (rgba (F, H, W, 4) uint8, depth (F, H, W) f32, seg (F, H, W) i32)
        """
        f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
        i32 = lambda a: jnp.asarray(np.asarray(a), jnp.int32)
        return self._render(
            f32(cam_states["m_inv"]), f32(cam_states["eye"]),
            f32(cam_states["forward"]),
            f32(scene["sph_pos"]), f32(scene["sph_r"]), f32(scene["sph_col"]),
            i32(scene["sph_id"]),
            f32(scene["box_pos"]), f32(scene["box_q"]), f32(scene["box_he"]),
            f32(scene["box_col"]), i32(scene["box_id"]),
            f32(scene["plane_col"]), has_plane=bool(scene["has_plane"]))


def capture_scene(backend):
    """Snapshot an AnalyticBackend's bodies for device raycasting.

    Returns (signature, static, frame) where ``signature`` keys compiled
    renderers (counts + which bodies), ``static`` holds per-group constants
    (sizes/colors/ids) and ``frame`` the per-frame poses. Bodies are sorted
    by id so the device hit resolution matches the host's iteration order.
    """
    spheres, boxes = [], []
    plane_col, has_plane = np.zeros(3), False
    for bid in sorted(backend.bodies):
        b = backend.bodies[bid]
        if b.shape == "plane":
            has_plane, plane_col = True, np.asarray(b.color, np.float64)
        elif b.shape == "sphere":
            spheres.append((bid, b))
        else:
            boxes.append((bid, b))
    signature = (has_plane, tuple(i for i, _ in spheres),
                 tuple(i for i, _ in boxes))
    static = {
        "sph_r": np.array([b.size[0] for _, b in spheres], np.float32),
        "sph_col": np.array([b.color for _, b in spheres],
                            np.float32).reshape(len(spheres), 3),
        "sph_id": np.array([i for i, _ in spheres], np.int32),
        "box_he": np.array([b.size for _, b in boxes],
                           np.float32).reshape(len(boxes), 3),
        "box_col": np.array([b.color for _, b in boxes],
                            np.float32).reshape(len(boxes), 3),
        "box_id": np.array([i for i, _ in boxes], np.int32),
        "plane_col": plane_col.astype(np.float32),
        "has_plane": has_plane,
    }
    frame = {
        "sph_pos": np.array([b.position for _, b in spheres],
                            np.float32).reshape(len(spheres), 3),
        "box_pos": np.array([b.position for _, b in boxes],
                            np.float32).reshape(len(boxes), 3),
        "box_q": np.array([b.orientation for _, b in boxes],
                          np.float32).reshape(len(boxes), 4),
    }
    return signature, static, frame
