"""Batched on-device analytic rigid-body stepping (JAX).

The host engine (``sim/physics.AnalyticBackend``) steps one scene at a time
in float64 numpy: semi-implicit Euler under gravity + sequential impulse
contact against the ground plane and every box's upward face
(physics.py:196-249, itself the TPU-era replacement for the reference's
Bullet stepping, mmdyn/tact_sim/utils/pybullet.py:24-37 /
experiments/exp_1_flat_plane.py:152). Every experiment CLI runs hundreds of
INDEPENDENT trials of the same tiny scene (3-4 bodies), so the stepping is a
natural vmap: this module packs a scene signature once, ``lax.scan``s the
exact step semantics over T timesteps, and vmaps over trials — positions and
contact normal forces for a whole corpus come back from ONE jitted call.
Combined with the packed device renderer (sim/raycast_jax.py +
sim/tactile_jax.py through cli/_simrun.py's DeferredFrames) this moves the
last host-bound piece of data generation onto the accelerator
(``--device-physics`` on the experiment CLIs).

Exactness: the step is a line-for-line port of AnalyticBackend.step —
support planes from the ground + every other box's upward face, sequential
resolution in body-id order (each body reads the LATEST positions of bodies
already stepped this tick), the center-above-face leapfrog guard, the
``|vn| < 0.5`` settle branch, tangential damping, and pybullet
applyExternalForce one-step semantics — in float32. Trajectory parity vs
the float64 host engine is asserted by tests/test_physics_jax.py at
bullet_diff-style tolerances.

Like the raycaster, per-body quantities are consumed as SCALAR reads of
traced arrays with the body/support loops unrolled at trace time (3-4
bodies): tiny-tensor einsums inside a scan make Mosaic/XLA compiles take
minutes, scalar reads compile in seconds with identical arithmetic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _rot_cols(q):
    """Columns of the rotation matrix of an xyzw quaternion ``q`` (4,) as a
    3x3 tuple-of-tuples of scalars (pybullet normalisation semantics,
    matching raycast_jax._quat_rot_scalars)."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, 1e-30), 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return ((1.0 - (yy + zz), xy - wz, xz + wy),
            (xy + wz, 1.0 - (xx + zz), yz - wx),
            (xz - wy, yz + wx, 1.0 - (xx + yy)))


class SimulatorJax:
    """Compiled batched stepper for one scene *signature*.

    The signature (per-body shape, movability, ground presence) is static —
    it shapes the unrolled program. Sizes, masses, quaternions, initial
    state, and external forces are traced, so ONE compiled program serves
    every object/trial drawn from a catalog with the same body composition.

    Body order is ascending backend id (the host's dict iteration order).
    Contact forces are returned as a dense (NB, NS) matrix per step, where
    slot 0 is the ground plane and slots 1..n are the box bodies in id
    order (``support_slot`` maps a body id to its slot).
    """

    def __init__(self, shapes: Tuple[str, ...], movable: Tuple[bool, ...],
                 time_step: float, gravity, restitution: float,
                 damping: float):
        self.shapes = tuple(shapes)
        self.movable = tuple(bool(m) for m in movable)
        self.time_step = float(time_step)
        self.gravity = np.asarray(gravity, np.float32)
        self.restitution = float(restitution)
        self.damping = float(damping)
        self.has_plane = bool(shapes) and shapes[0] == "plane"
        self._boxes = [i for i, s in enumerate(self.shapes) if s == "box"]
        # support slot 0 = ground, then boxes in id order
        self.n_supports = 1 + len(self._boxes)
        self._slot_of = {b: 1 + k for k, b in enumerate(self._boxes)}
        self._run_batch = jax.jit(jax.vmap(self._run, in_axes=0))

    def support_slot(self, body_index: int) -> int:
        """Contact-matrix column of a box body (column 0 is the ground)."""
        return self._slot_of[body_index]

    # --- one step (exact port of AnalyticBackend.step) ---------------------

    def _step(self, pos, vel, quat, sizes, mass, force):
        dt = jnp.float32(self.time_step)
        g = jnp.asarray(self.gravity)
        cf = jnp.zeros((len(self.shapes), self.n_supports), jnp.float32)

        for i, shape in enumerate(self.shapes):
            if not self.movable[i]:
                continue
            p = pos[i]
            v = vel[i] + (g + force[i] / mass[i]) * dt
            p = p + v * dt
            r_i = _rot_cols(quat[i])

            supports = []
            if self.has_plane:
                supports.append((0, True))
            supports += [(j, False) for j in self._boxes if j != i]
            for j, is_ground in supports:
                if is_ground:
                    n = jnp.array([0.0, 0.0, 1.0])
                    plane_pt = jnp.zeros(3)
                else:
                    r_j = _rot_cols(quat[j])
                    col = jnp.stack([r_j[0][2], r_j[1][2], r_j[2][2]])
                    n = jnp.where(col[2] < 0, -col, col)
                    plane_pt = pos[j] + n * sizes[j, 2]
                # support reach of body i along n (physics.py::_reach_along)
                if shape == "sphere":
                    reach = sizes[i, 0]
                else:
                    ndotr = [n[0] * r_i[0][c] + n[1] * r_i[1][c]
                             + n[2] * r_i[2][c] for c in range(3)]
                    reach = sum(jnp.abs(ndotr[c]) * sizes[i, c]
                                for c in range(3))
                center_height = jnp.dot(p - plane_pt, n)
                d = center_height - reach
                active = (d < 0) & (center_height > 0)
                if not is_ground:
                    # lateral containment in the support face plane
                    rel = p - plane_pt
                    local = [r_j[0][c] * rel[0] + r_j[1][c] * rel[1]
                             + r_j[2][c] * rel[2] for c in range(2)]
                    active &= ((jnp.abs(local[0]) <= sizes[j, 0])
                               & (jnp.abs(local[1]) <= sizes[j, 1]))
                # resolve penetration along the face normal
                p = jnp.where(active, p - n * d, p)
                vn = jnp.dot(v, n)
                neg = active & (vn < 0)
                dv = jnp.where(jnp.abs(vn) < 0.5, -vn,
                               -(1.0 + self.restitution) * vn)
                v = jnp.where(neg, v + n * dv, v)
                impulse = jnp.where(neg, mass[i] * dv / dt, 0.0)
                # tangential friction damping relative to the support's own
                # tangential motion (physics.py: moving supports drag their
                # riders; static supports have sup_t == 0 exactly, keeping
                # exp_1/exp_2 bit-identical). vel[j] is the support's LATEST
                # velocity this tick — same id-order convention as positions.
                vn_new = jnp.dot(v, n)
                v_t = v - n * vn_new
                if is_ground or not self.movable[j]:
                    sup_t = jnp.zeros(3)
                else:
                    sv = vel[j]
                    sup_t = sv - n * jnp.dot(sv, n)
                v = jnp.where(active,
                              n * vn_new + sup_t + (v_t - sup_t) * self.damping,
                              v)
                rest_force = mass[i] * jnp.dot(-g, n)
                normal_force = jnp.where(impulse > 0, impulse, rest_force)
                slot = 0 if is_ground else self._slot_of[j]
                cf = cf.at[i, slot].set(jnp.where(active, normal_force, 0.0))
            pos = pos.at[i].set(p)
            vel = vel.at[i].set(v)
        return pos, vel, cf

    # --- rollout ------------------------------------------------------------

    def _run(self, args):
        pos, vel, quat, sizes, mass, ext = args

        def f(carry, force_t):
            p, v = carry
            p2, v2, cf = self._step(p, v, quat, sizes, mass, force_t)
            # ys[t] = the PRE-step pose — the experiment loops snapshot
            # before backend.step() (exp_1_flat_plane.py:136-145)
            return (p2, v2), (p, cf)

        (pf, vf), (ptraj, cftraj) = lax.scan(f, (pos, vel), ext)
        return {"pos": ptraj, "contact_force": cftraj,
                "final_pos": pf, "final_vel": vf}

    def simulate(self, pos, vel, quat, sizes, mass, n_steps: int,
                 ext_forces: Optional[np.ndarray] = None):
        """Batched rollout.

        Args (leading axis K = trials):
            pos, vel: (K, NB, 3); quat: (K, NB, 4); sizes: (K, NB, 3)
            (sphere radius in column 0); mass: (K, NB); ext_forces:
            (K, T, NB, 3) world-frame forces applied during step t
            (pybullet applyExternalForce next-step-only semantics) or None.

        Returns dict of device arrays:
            pos (K, T, NB, 3) — pose BEFORE step t (pos[:, 0] is the initial
            state, matching the snapshot-then-step experiment loops);
            contact_force (K, T, NB, NS) — normal forces DURING step t
            (a snapshot at iteration t reads the forces of step t-1);
            final_pos / final_vel (K, NB, 3).
        """
        f32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
        k, nb = np.asarray(pos).shape[:2]
        if ext_forces is None:
            ext = jnp.zeros((k, int(n_steps), nb, 3), jnp.float32)
        else:
            ext = f32(ext_forces)
        return self._run_batch((f32(pos), f32(vel), f32(quat), f32(sizes),
                                f32(mass), ext))


def pack_scene(backend):
    """Pack an AnalyticBackend's bodies for SimulatorJax.

    Returns (sim, ids, consts) where ``sim`` is keyed by the scene's static
    signature (shared across backends with identical body composition via
    ``cached_simulator``), ``ids`` maps array index -> backend body id, and
    ``consts`` holds this scene's per-body arrays (quat/sizes/mass) plus the
    current state (pos/vel).
    """
    ids = sorted(backend.bodies)
    nb = len(ids)
    shapes, movable = [], []
    sizes = np.zeros((nb, 3), np.float32)
    mass = np.ones(nb, np.float32)
    quat = np.zeros((nb, 4), np.float32)
    pos = np.zeros((nb, 3), np.float32)
    vel = np.zeros((nb, 3), np.float32)
    for k, bid in enumerate(ids):
        b = backend.bodies[bid]
        shapes.append(b.shape)
        movable.append((not b.fixed) and b.shape != "plane" and b.mass > 0)
        sz = np.asarray(b.size, np.float64).reshape(-1)
        sizes[k, :sz.shape[0]] = sz
        mass[k] = max(b.mass, 1e-9)
        quat[k] = np.asarray(b.orientation, np.float64)
        pos[k] = np.asarray(b.position, np.float64)
        vel[k] = np.asarray(b.velocity, np.float64)
    sim = cached_simulator(tuple(shapes), tuple(movable), backend.time_step,
                           tuple(np.asarray(backend.gravity, np.float64)),
                           backend.restitution, backend.damping)
    consts = {"sizes": sizes, "mass": mass, "quat": quat,
              "pos": pos, "vel": vel}
    return sim, ids, consts


_SIM_CACHE = {}


def cached_simulator(shapes, movable, time_step, gravity, restitution,
                     damping) -> SimulatorJax:
    """One SimulatorJax (and thus one compiled program per T) per static
    scene signature."""
    key = (tuple(shapes), tuple(movable), float(time_step),
           tuple(float(x) for x in gravity), float(restitution),
           float(damping))
    if key not in _SIM_CACHE:
        _SIM_CACHE[key] = SimulatorJax(shapes, movable, time_step, gravity,
                                       restitution, damping)
    return _SIM_CACHE[key]
