"""Batched on-device tactile rendering (JAX).

The host tactile pipeline (TactileSensor.get_sensor_pointcloud +
get_tactile_image: unproject -> normals -> Phong -> darken,
sensor.py:383-445) renders ONE frame at a time on CPU. On a static sensor the
tactile image is a pure function of the clipped depth buffer, so the whole
pipeline vectorises over a batch of depth frames and jits onto TPU:

    renderer = TactileRendererJax.from_sensor(sensor)
    tactile = renderer(depth_batch)           # (B, H, W) -> (B, H, W, 3) u8

This makes simulator post-processing batchable at training scale (e.g.
re-rendering whole datasets with new light settings) — the reference's NumPy
loop spends seconds per frame on the 307k-point Phong sum.

Numerics match the host pipeline: same unprojection matrices, same
central-difference grid normals, same Phong formula and penetration
darkening; uint8 rounding at the end.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class TactileRendererJax:
    def __init__(self, view_matrix, projection_matrix, width, height, near,
                 far, camera_eye, light_dirs, i_diffuses, i_speculars,
                 k_diffuse, k_specular, k_ambient, ambient, alpha,
                 background_color, max_buffer_depth, layer_thickness,
                 darkening_factor):
        m = np.matmul(np.asarray(projection_matrix), np.asarray(view_matrix))
        self._m_inv = jnp.asarray(np.linalg.inv(m), jnp.float32)
        self._width, self._height = int(width), int(height)
        self._near, self._far = float(near), float(far)
        self._eye = jnp.asarray(np.asarray(camera_eye, np.float64), jnp.float32)
        self._light_dirs = jnp.asarray(np.stack(light_dirs)[:, :, None], jnp.float32)
        self._i_diffuses = jnp.asarray(np.stack(i_diffuses)[:, :, None], jnp.float32)
        self._i_speculars = jnp.asarray(np.stack(i_speculars)[:, :, None], jnp.float32)
        self._k_diffuse = float(k_diffuse)
        self._k_specular = float(k_specular)
        self._k_ambient = float(k_ambient)
        self._ambient = float(ambient)
        self._alpha = float(alpha)
        self._bg = jnp.asarray(np.asarray(background_color[:3], np.float64), jnp.float32)
        self._max_depth = float(max_buffer_depth)
        self._thickness = float(layer_thickness)
        self._dark = float(darkening_factor)

        self._proj = np.asarray(projection_matrix, np.float64)
        # pixel grid generated in-trace (broadcasted_iota), not closed over
        # as a 1.2 MB device constant: embedded constants must be downloaded
        # through the tunnel at each process's first lowering and bloat the
        # serialized HLO the compile cache ships (see raycast_jax.py)
        self._render = jax.jit(self._render_batch)
        self._render_dyn = jax.jit(self._render_batch_dynamic)

    # renderer cache keyed by the camera/shader constants: the data-collection
    # CLIs create one sensor per TRIAL, and a fresh renderer per trial would
    # recompile its jitted pipeline each time (~6 s/trial through the TPU
    # tunnel, swamping the shading win). Keyed construction makes repeated
    # identical-config trials reuse one compiled pipeline.
    _cache = {}

    @classmethod
    def cached_from_sensor(cls, sensor):
        """from_sensor with config-keyed caching (see _cache note)."""
        sensor._set_lights(i_specular=2.0, i_diffuse=2.0)
        cam = sensor.camera
        key = (
            tuple(np.asarray(cam.view_matrix).ravel().tolist()),
            tuple(np.asarray(cam.projection_matrix).ravel().tolist()),
            cam.width, cam.height, float(cam.near), float(cam.far),
            tuple(np.asarray(sensor.background_color).ravel().tolist()),
            float(sensor.max_buffer_depth), float(sensor.layer_thickness),
            float(sensor._darkening_factor),
            tuple(np.concatenate([np.asarray(l.direction).ravel()
                                  for l in sensor._shader.lights]).tolist()),
        )
        if key not in cls._cache:
            cls._cache[key] = cls.from_sensor(sensor)
        return cls._cache[key]

    @classmethod
    def from_sensor(cls, sensor):
        """Snapshot a TactileSensor's camera + shader configuration.
        Call after at least one get_sensor_image() so the view matrix is set.
        The four edge lights are the i_specular=i_diffuse=2.0 configuration
        used by get_tactile_image (sensor.py:429)."""
        sensor._set_lights(i_specular=2.0, i_diffuse=2.0)
        cam = sensor.camera
        sh = sensor._shader
        return cls(
            view_matrix=cam.view_matrix,
            projection_matrix=cam.projection_matrix,
            width=cam.width, height=cam.height,
            near=cam.near, far=cam.far,
            camera_eye=cam.camera_eye_position,
            light_dirs=[np.asarray(l.direction).reshape(3) for l in sh.lights],
            i_diffuses=[np.asarray(l.i_diffuse).reshape(3) for l in sh.lights],
            i_speculars=[np.asarray(l.i_specular).reshape(3) for l in sh.lights],
            k_diffuse=sh._k_diffuse, k_specular=sh._k_specular,
            k_ambient=sh._k_ambient, ambient=sh._ambient_lightning,
            alpha=sh._alpha,
            background_color=sensor.background_color,
            max_buffer_depth=float(sensor.max_buffer_depth),
            layer_thickness=sensor.layer_thickness,
            darkening_factor=sensor._darkening_factor,
        )

    @staticmethod
    def capture_frame_state(sensor):
        """Per-frame camera/light state for a possibly MOVING sensor (the
        exp_3 shock displaces it): returns (m_inv, eye, light_dirs) numpy
        arrays snapshotting the camera at the current pose. Use with
        ``render_frames`` when view matrices differ across the batch."""
        cam = sensor.camera
        m = np.matmul(np.asarray(cam.projection_matrix),
                      np.asarray(cam.view_matrix))
        dirs = np.stack([-sensor._surface_vec_1, sensor._surface_vec_1,
                         -sensor._surface_vec_2, sensor._surface_vec_2])
        return (np.linalg.inv(m).astype(np.float32),
                np.asarray(cam.camera_eye_position, np.float32),
                dirs.astype(np.float32))

    def render_frames(self, depth_batch, m_invs, eyes, light_dirs):
        """(B, H, W) depths + per-frame (B, 4, 4) inverse view-projections,
        (B, 3) eyes and (B, 4, 3) light directions -> (B, H, W, 3) uint8.
        Same math as ``__call__`` but nothing camera-dependent is baked in."""
        # jnp.asarray keeps an already-on-device depth batch (the packed
        # raycast path) on device; numpy inputs upload as before
        return self._render_dyn(
            jnp.asarray(depth_batch, jnp.float32),
            jnp.asarray(np.asarray(m_invs), jnp.float32),
            jnp.asarray(np.asarray(eyes), jnp.float32),
            jnp.asarray(np.asarray(light_dirs), jnp.float32))

    # --- pipeline (scalar-unrolled over components/lights) ------------------
    #
    # Every stage works on per-component (H, W) grids with the tiny
    # camera/light quantities consumed as SCALARS (m_inv[i, j], eye[c],
    # dirs[li, c]). Expressing them as small traced tensors — an einsum over a
    # per-frame (4, 4) matrix, an (L, 3, 1, 1) light broadcast — makes the
    # Mosaic compile of the vmapped per-frame path take minutes instead of
    # seconds (measured: 180-380 s vs ~6 s). Scalar reads of traced arrays
    # compile fine and the arithmetic is identical.

    def _render_one(self, depth_b, m_inv=None, eye=None, dirs=None):
        if m_inv is None:
            m_inv = self._m_inv
        if eye is None:
            eye = self._eye
        if dirs is None:
            dirs = self._light_dirs[:, :, 0]              # (L, 3)

        # unproject: window -> ndc -> world (camera.py unproject pipeline)
        z_w = (self._far - self._near) * depth_b + self._near
        shape = (self._height, self._width)
        xm = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
        ym = jax.lax.broadcasted_iota(jnp.float32, shape, 0)
        x_ndc = 2.0 * xm / self._width - 1.0
        y_ndc = 2.0 * ym / self._height - 1.0
        z_ndc = (2.0 * z_w - (self._far + self._near)) / (self._far - self._near)
        ones = jnp.ones_like(z_ndc)
        pc = (x_ndc, y_ndc, z_ndc, ones)
        world = [sum(m_inv[i, j] * pc[j] for j in range(4)) for i in range(4)]
        pt = [world[c] / world[3] for c in range(3)]      # 3 x (H, W)

        # central-difference grid normals oriented towards the camera
        # (normals.py::grid_normals semantics)
        def cdx(a):
            return jnp.concatenate([a[:, 1:2] - a[:, 0:1],
                                    a[:, 2:] - a[:, :-2],
                                    a[:, -1:] - a[:, -2:-1]], axis=1)

        def cdy(a):
            return jnp.concatenate([a[1:2] - a[0:1],
                                    a[2:] - a[:-2],
                                    a[-1:] - a[-2:-1]], axis=0)

        dx = [cdx(p) for p in pt]
        dy = [cdy(p) for p in pt]
        n = [dx[1] * dy[2] - dx[2] * dy[1],
             dx[2] * dy[0] - dx[0] * dy[2],
             dx[0] * dy[1] - dx[1] * dy[0]]
        norm = jnp.sqrt(n[0] * n[0] + n[1] * n[1] + n[2] * n[2])
        safe = jnp.maximum(norm, 1e-12)
        n = [jnp.where(norm > 0, c / safe, 0.0) for c in n]
        v = [eye[c] - pt[c] for c in range(3)]            # to-camera = view
        flip = (n[0] * v[0] + n[1] * v[1] + n[2] * v[2]) < 0
        n = [jnp.where(flip, -c, c) for c in n]

        # Phong (shader.py:78-113), lights unrolled; i_d/i_s are constants
        i_d = np.asarray(self._i_diffuses)[:, :, 0]       # (L, 3) python consts
        i_s = np.asarray(self._i_speculars)[:, :, 0]
        contrib = [0.0, 0.0, 0.0]
        for li in range(i_d.shape[0]):
            ndotl = jnp.clip(dirs[li, 0] * n[0] + dirs[li, 1] * n[1]
                             + dirs[li, 2] * n[2], 0.0, None)
            r = [2.0 * ndotl * n[c] - dirs[li, c] for c in range(3)]
            rdotv = r[0] * v[0] + r[1] * v[1] + r[2] * v[2]
            spec = rdotv ** self._alpha
            for c in range(3):
                contrib[c] = (contrib[c] + self._k_diffuse * ndotl
                              * float(i_d[li, c])
                              + self._k_specular * spec * float(i_s[li, c]))
        dark = (self._max_depth - depth_b) * self._dark / self._thickness
        chans = []
        for c in range(3):
            illum = self._k_ambient * self._ambient + contrib[c]
            shaded = jnp.clip(self._bg[c] * illum, 0.0, 255.0)
            # match the host pipeline's uint8 wrap of over-darkened pixels
            chans.append(jnp.rint(shaded - dark).astype(jnp.int32) % 256)
        return jnp.stack(chans, axis=-1).astype(jnp.uint8)

    def _render_batch(self, depth_batch):
        return jax.vmap(self._render_one)(depth_batch)

    def _render_batch_dynamic(self, depth_batch, m_invs, eyes, light_dirs):
        return jax.vmap(self._render_one)(depth_batch, m_invs, eyes,
                                          light_dirs)

    def __call__(self, depth_batch):
        """(B, H, W) normalised clipped depth buffers -> (B, H, W, 3) uint8."""
        return self._render(jnp.asarray(depth_batch, jnp.float32))
