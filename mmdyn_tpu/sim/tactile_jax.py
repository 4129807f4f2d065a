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
        self._width, self._height = width, height
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

        x = np.arange(width, dtype=np.float32)
        y = np.arange(height, dtype=np.float32)
        xm, ym = np.meshgrid(x, y)
        self._xm = jnp.asarray(xm)
        self._ym = jnp.asarray(ym)
        self._render = jax.jit(self._render_batch)

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

    # --- pipeline stages (all (H, W) grids, batched over leading axis) ------

    def _unproject(self, depth_b):
        """Normalised depth buffer -> world points (3, H, W)."""
        z_w = (self._far - self._near) * depth_b + self._near
        # window -> ndc
        x_ndc = 2.0 * self._xm / self._width - 1.0
        y_ndc = 2.0 * self._ym / self._height - 1.0
        z_ndc = (2.0 * z_w - (self._far + self._near)) / (self._far - self._near)
        ones = jnp.ones_like(z_ndc)
        p = jnp.stack([x_ndc, y_ndc, z_ndc, ones])       # (4, H, W)
        world = jnp.einsum("ij,jhw->ihw", self._m_inv, p)
        return world[:3] / world[3:4]

    @staticmethod
    def _grid_normals(points, eye):
        """Central-difference normals oriented towards the camera
        (normals.py::grid_normals semantics), points (3, H, W)."""
        p = points
        dx = jnp.concatenate([
            (p[:, :, 1:2] - p[:, :, 0:1]),
            p[:, :, 2:] - p[:, :, :-2],
            (p[:, :, -1:] - p[:, :, -2:-1])], axis=2)
        dy = jnp.concatenate([
            (p[:, 1:2, :] - p[:, 0:1, :]),
            p[:, 2:, :] - p[:, :-2, :],
            (p[:, -1:, :] - p[:, -2:-1, :])], axis=1)
        n = jnp.cross(dx, dy, axisa=0, axisb=0, axisc=0)
        norm = jnp.linalg.norm(n, axis=0, keepdims=True)
        n = jnp.where(norm > 0, n / jnp.maximum(norm, 1e-12), 0.0)
        to_cam = eye[:, None, None] - p
        flip = jnp.sum(n * to_cam, axis=0, keepdims=True) < 0
        return jnp.where(flip, -n, n)

    def _illumination(self, points, normals):
        """Phong over (3, H, W) grids -> (3, H, W) (shader.py:78-113)."""
        v = self._eye[:, None, None] - points
        l = self._light_dirs[:, :, :, None]               # (L, 3, 1, 1)
        ndotl = jnp.clip(jnp.sum(l * normals[None], axis=1), 0.0, None)  # (L,H,W)
        r = 2 * ndotl[:, None] * normals[None] - l        # (L, 3, H, W)
        rdotv = jnp.sum(r * v[None], axis=1)              # (L, H, W)
        contrib = (self._k_diffuse * ndotl[:, None] * self._i_diffuses[:, :, :, None]
                   + self._k_specular * (rdotv ** self._alpha)[:, None]
                   * self._i_speculars[:, :, :, None])
        return self._k_ambient * self._ambient + jnp.sum(contrib, axis=0)

    def _render_one(self, depth_b):
        points = self._unproject(depth_b)
        normals = self._grid_normals(points, self._eye)
        illum = self._illumination(points, normals)       # (3, H, W)
        shaded = jnp.clip(self._bg[:, None, None] * illum, 0.0, 255.0)
        dark = (self._max_depth - depth_b) * self._dark / self._thickness
        out = shaded - dark[None]
        # match the host pipeline's uint8 wrap of over-darkened pixels
        out = jnp.rint(out).astype(jnp.int32) % 256
        return jnp.transpose(out, (1, 2, 0)).astype(jnp.uint8)

    def _render_batch(self, depth_batch):
        return jax.vmap(self._render_one)(depth_batch)

    def __call__(self, depth_batch):
        """(B, H, W) normalised clipped depth buffers -> (B, H, W, 3) uint8."""
        return self._render(jnp.asarray(depth_batch, jnp.float32))
