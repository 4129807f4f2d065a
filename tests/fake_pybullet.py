"""A functional fake of the `pybullet` module for contract-testing the
Bullet-facing code paths (sim/pybullet_utils.py, PyBulletBackend, the
virtual-link/constraint branches of sim/sensor.py, demo/exp CLIs) in
environments without Bullet.

Semantics, not just recording: bodies live in a real AnalyticBackend
(mmdyn_tpu/sim/physics.py) — meshes are approximated by their bounding box
(parsed with mmdyn_tpu/sim/meshio.py), stepSimulation integrates gravity +
contacts, and getCameraImage raycasts through the passed view/projection
matrices. Every call is also appended to ``CALLS`` for sequence assertions.

Install with::

    import tests.fake_pybullet as fake
    fake.install()         # registers sys.modules['pybullet'/'pybullet_data']
    ...
    fake.uninstall()

API surface implemented = exactly the calls the framework makes (grep
``p\\.`` under mmdyn_tpu/sim/), mirroring the real pybullet signatures used at
/root/reference/mmdyn/tact_sim/utils/pybullet.py:8-239 and
tactile/sensor.py:16-256.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np


class error(Exception):
    """pybullet.error lookalike (raised for unloadable meshes)."""


class FakePyBullet:
    # real pybullet constant values
    GUI = 1
    DIRECT = 2
    GEOM_MESH = 5
    JOINT_REVOLUTE = 0
    JOINT_PRISMATIC = 1
    JOINT_FIXED = 4
    VELOCITY_CONTROL = 0
    POSITION_CONTROL = 2
    WORLD_FRAME = 2
    LINK_FRAME = 1
    ER_BULLET_HARDWARE_OPENGL = 131072
    ER_TINY_RENDERER = 65536
    error = error

    def __init__(self):
        self.reset_module()

    def reset_module(self):
        from mmdyn_tpu.sim.physics import AnalyticBackend
        self.CALLS = []
        self._backend = AnalyticBackend(load_plane=False)
        self._connected = None
        self._search_paths = []
        self._visual_shapes = {}
        self._collision_shapes = {}
        self._constraints = {}
        self._body_links = {}          # body id -> n virtual links
        self._joint_targets = {}       # body id -> {joint: velocity}
        self._debug_params = {}
        self._debug_lines = {}
        self._textures = {}
        self._next_shape = 0
        self._next_constraint = 0
        self._next_debug = 0
        self._camera_cache = {}

    # -- internals ----------------------------------------------------------

    def _rec(self, _fname, **kw):
        self.CALLS.append((_fname, kw))

    def _new_id(self, attr):
        v = getattr(self, attr)
        setattr(self, attr, v + 1)
        return v

    def _resolve_mesh(self, file_name):
        """Mesh file -> (half_extents, center) box approximation. Searches the
        registered data paths like Bullet; unit cube fallback for the bundled
        pybullet_data primitives (cube.obj etc.)."""
        path = Path(str(file_name))
        candidates = [path] + [Path(sp) / path.name for sp in self._search_paths]
        for c in candidates:
            if c.is_file() and c.suffix == ".obj":
                from mmdyn_tpu.sim.meshio import obj_bounds
                lo, hi = obj_bounds(c)
                return (hi - lo) / 2.0, (hi + lo) / 2.0
        if path.name in ("cube.obj", "plane100.obj", "duck.obj",
                         "duck_vhacd.obj"):
            return np.full(3, 0.5), np.zeros(3)
        raise error(f"Cannot load mesh file: {file_name}")

    # -- session ------------------------------------------------------------

    def connect(self, mode):
        self._rec("connect", mode=mode)
        self._connected = mode
        return 0

    def disconnect(self):
        self._rec("disconnect")
        self._connected = None

    def isConnected(self):
        return self._connected is not None

    def resetSimulation(self):
        self._rec("resetSimulation")
        self._backend.reset()
        self._body_links.clear()
        self._joint_targets.clear()
        self._constraints.clear()

    def setAdditionalSearchPath(self, path):
        self._rec("setAdditionalSearchPath", path=path)
        self._search_paths.append(str(path))

    def setTimeStep(self, dt):
        self._rec("setTimeStep", dt=dt)
        self._backend.time_step = dt

    def setGravity(self, gx, gy, gz):
        self._rec("setGravity", g=(gx, gy, gz))
        self._backend.gravity = np.array([gx, gy, gz], dtype=np.float64)

    def resetDebugVisualizerCamera(self, dist, yaw, pitch, target):
        self._rec("resetDebugVisualizerCamera", dist=dist)

    def loadURDF(self, file_name, *a, **kw):
        self._rec("loadURDF", file=file_name)
        from mmdyn_tpu.sim.physics import _Body
        if "plane" in str(file_name):
            return self._backend._add(_Body(
                "plane", np.zeros(1), np.zeros(3), np.array([0, 0, 0, 1.0]),
                np.zeros(3), 0.0, np.array([0.85, 0.85, 0.85]), True))
        return self._backend.add_box(np.full(3, 0.5), (0, 0, 0.5))

    # -- shapes / bodies ------------------------------------------------------

    def createVisualShape(self, shapeType, fileName=None, rgbaColor=None,
                          specularColor=None, visualFramePosition=None,
                          meshScale=(1, 1, 1), **kw):
        self._rec("createVisualShape", fileName=str(fileName),
                  meshScale=tuple(meshScale))
        vid = self._new_id("_next_shape")
        self._visual_shapes[vid] = {"file": fileName, "rgba": rgbaColor,
                                    "scale": np.asarray(meshScale, np.float64)}
        return vid

    def createCollisionShape(self, shapeType, fileName=None,
                             collisionFramePosition=None, meshScale=(1, 1, 1),
                             **kw):
        self._rec("createCollisionShape", fileName=str(fileName),
                  meshScale=tuple(meshScale))
        half, center = self._resolve_mesh(fileName)
        scale = np.asarray(meshScale, np.float64)
        cid = self._new_id("_next_shape")
        self._collision_shapes[cid] = {"half": half * scale,
                                       "center": center * scale}
        return cid

    def createMultiBody(self, baseMass=0.0, baseInertialFramePosition=(0, 0, 0),
                        baseInertialFrameOrientation=(0, 0, 0, 1),
                        baseCollisionShapeIndex=-1, baseVisualShapeIndex=-1,
                        basePosition=(0, 0, 0), baseOrientation=(0, 0, 0, 1),
                        linkMasses=None, linkCollisionShapeIndices=None,
                        linkVisualShapeIndices=None, linkPositions=None,
                        linkOrientations=None, linkInertialFramePositions=None,
                        linkInertialFrameOrientations=None,
                        linkParentIndices=None, linkJointTypes=None,
                        linkJointAxis=None, useMaximalCoordinates=False, **kw):
        n_links = len(linkMasses) if linkMasses else 0
        self._rec("createMultiBody", mass=baseMass, n_links=n_links,
                  position=tuple(basePosition))
        shape = self._collision_shapes.get(baseCollisionShapeIndex,
                                           {"half": np.full(3, 0.5),
                                            "center": np.zeros(3)})
        visual = self._visual_shapes.get(baseVisualShapeIndex, {})
        rgba = visual.get("rgba") or (1, 1, 1, 1)
        bid = self._backend.add_box(
            shape["half"], np.asarray(basePosition, np.float64),
            orientation=np.asarray(baseOrientation, np.float64),
            mass=float(baseMass), color=np.asarray(rgba[:3], np.float64),
            fixed=(baseMass == 0))
        self._body_links[bid] = n_links
        return bid

    def removeBody(self, body_id):
        self._rec("removeBody", body=body_id)
        self._backend.remove_body(body_id)
        self._body_links.pop(body_id, None)

    def getNumBodies(self):
        return self._backend.num_bodies()

    def getBodyUniqueId(self, index):
        return sorted(self._backend.bodies.keys())[index]

    def getNumJoints(self, body_id):
        return self._body_links.get(body_id, 0)

    def loadTexture(self, textureFilename):
        self._rec("loadTexture", file=str(textureFilename))
        tid = self._new_id("_next_shape")
        self._textures[tid] = str(textureFilename)
        return tid

    def changeVisualShape(self, objectUniqueId, linkIndex, rgbaColor=None,
                          textureUniqueId=None, **kw):
        self._rec("changeVisualShape", body=objectUniqueId,
                  rgba=tuple(rgbaColor) if rgbaColor else None,
                  texture=textureUniqueId)
        if rgbaColor is not None and objectUniqueId in self._backend.bodies:
            self._backend.bodies[objectUniqueId].color = np.asarray(
                rgbaColor[:3], np.float64)

    def changeDynamics(self, bodyUniqueId, linkIndex, **kw):
        self._rec("changeDynamics", body=bodyUniqueId, link=linkIndex,
                  keys=tuple(sorted(kw)))

    # -- poses / dynamics -----------------------------------------------------

    def getBasePositionAndOrientation(self, body_id):
        return self._backend.get_pose(body_id)

    def resetBasePositionAndOrientation(self, body_id, position, orientation):
        self._rec("resetBasePositionAndOrientation", body=body_id)
        self._backend.set_pose(body_id, position, orientation)

    def applyExternalForce(self, body_id, link, force, position, frame):
        self._rec("applyExternalForce", body=body_id, force=tuple(force),
                  frame=frame)
        self._backend.apply_external_force(body_id, force)

    def stepSimulation(self):
        self._rec("stepSimulation")
        dt = self._backend.time_step
        from mmdyn_tpu.sim.transforms import euler_from_quat, quat_from_euler
        for bid, targets in self._joint_targets.items():
            if bid not in self._backend.bodies or not targets:
                continue
            pos, orn = self._backend.get_pose(bid)
            lin = np.array([targets.get(j, 0.0) for j in range(3)])
            ang = np.array([targets.get(j, 0.0) for j in range(3, 6)])
            new_pos = np.asarray(pos) + lin * dt
            new_orn = quat_from_euler(euler_from_quat(orn) + ang * dt)
            self._backend.set_pose(bid, new_pos, new_orn)
        self._backend.step()

    def getContactPoints(self, body_id):
        pts = []
        for c in self._backend.contacts(body_id):
            # layout matches pybullet: [1]=bodyA [2]=bodyB [5]=positionOnA
            # [9]=normalForce
            pts.append((0, c.body_a, c.body_b, -1, -1, tuple(c.position),
                        tuple(c.position), (0.0, 0.0, 1.0), 0.0,
                        float(c.normal_force), 0.0, (0, 0, 0), 0.0, (0, 0, 0)))
        return tuple(pts)

    # -- constraints / joints --------------------------------------------------

    def createConstraint(self, parentBodyUniqueId, parentLinkIndex,
                         childBodyUniqueId, childLinkIndex, jointType,
                         jointAxis, parentFramePosition, childFramePosition,
                         childFrameOrientation=None, **kw):
        self._rec("createConstraint", parent=parentBodyUniqueId,
                  joint_type=jointType)
        cid = self._new_id("_next_constraint")
        self._constraints[cid] = {"parent": parentBodyUniqueId,
                                  "type": jointType}
        # a fixed constraint to the world pins the body
        if childBodyUniqueId == -1 and parentBodyUniqueId in self._backend.bodies:
            self._backend.bodies[parentBodyUniqueId].fixed = True
        return cid

    def changeConstraint(self, constraint_id, jointChildPivot,
                         jointChildFrameOrientation=None, maxForce=None):
        self._rec("changeConstraint", constraint=constraint_id,
                  max_force=maxForce)
        parent = self._constraints[constraint_id]["parent"]
        if parent in self._backend.bodies:
            orn = (jointChildFrameOrientation
                   if jointChildFrameOrientation is not None else
                   self._backend.get_pose(parent)[1])
            self._backend.set_pose(parent, jointChildPivot, orn)

    def setJointMotorControl2(self, bodyUniqueId, jointIndex, controlMode,
                              targetPosition=0, targetVelocity=0,
                              positionGain=None, velocityGain=None,
                              force=None):
        self._rec("setJointMotorControl2", body=bodyUniqueId,
                  joint=jointIndex, mode=controlMode)
        tj = self._joint_targets.setdefault(bodyUniqueId, {})
        if controlMode == self.VELOCITY_CONTROL:
            tj[jointIndex] = float(targetVelocity)
        else:
            tj[jointIndex] = 0.0
        # kinematic while motor-driven
        if bodyUniqueId in self._backend.bodies:
            self._backend.bodies[bodyUniqueId].fixed = True

    # -- debug UI -------------------------------------------------------------

    def addUserDebugParameter(self, name, range_min, range_max, start):
        self._rec("addUserDebugParameter", name=name)
        did = self._new_id("_next_debug")
        self._debug_params[did] = float(start)
        return did

    def readUserDebugParameter(self, param_id):
        return self._debug_params[param_id]

    def addUserDebugLine(self, line_from, line_to, color,
                         replaceItemUniqueId=None, **kw):
        self._rec("addUserDebugLine", replace=replaceItemUniqueId)
        if replaceItemUniqueId is not None:
            self._debug_lines[replaceItemUniqueId] = (line_from, line_to)
            return replaceItemUniqueId
        did = self._new_id("_next_debug")
        self._debug_lines[did] = (line_from, line_to)
        return did

    # -- rendering --------------------------------------------------------------

    def _adapter_camera(self, width, height, view_flat, proj_flat):
        """Reconstruct a Camera from the column-major flattened matrices that
        Bullet consumes (camera.py:359-363), so the analytic raycaster can
        render through it."""
        view = np.asarray(view_flat, np.float64).reshape(4, 4, order="F")
        proj = np.asarray(proj_flat, np.float64).reshape(4, 4, order="F")
        key = (width, height, view.tobytes(), proj.tobytes())
        cam = self._camera_cache.get((width, height))
        if cam is not None and cam._fake_key == key:
            return cam
        from mmdyn_tpu.sim.camera import Camera
        cam = Camera(width, height)
        cam._view_mat = view
        cam._projection_mat = proj
        a, b = proj[2, 2], proj[2, 3]
        cam._near = b / (a - 1)
        cam._far = b / (a + 1)
        rot, trans = view[:3, :3], view[:3, 3]
        eye = -rot.T @ trans
        forward = -rot[2]                      # view row 2 is -forward
        cam._camera_eye_pos = eye
        cam._camera_target_pos = eye + forward
        cam._fake_key = key
        self._camera_cache[(width, height)] = cam
        return cam

    def getCameraImage(self, width, height, viewMatrix=None,
                       projectionMatrix=None, renderer=None, **kw):
        self._rec("getCameraImage", width=width, height=height,
                  renderer=renderer)
        cam = self._adapter_camera(width, height, viewMatrix, projectionMatrix)
        rgb, depth, seg = self._backend.render(cam)
        return width, height, rgb, depth, seg

    # -- misc ---------------------------------------------------------------

    def getQuaternionFromEuler(self, euler):
        from mmdyn_tpu.sim.transforms import quat_from_euler
        return tuple(quat_from_euler(euler))

    def getEulerFromQuaternion(self, quat):
        from mmdyn_tpu.sim.transforms import euler_from_quat
        return tuple(euler_from_quat(quat))


class FakePyBulletData:
    """pybullet_data lookalike: an (empty) temp data dir."""

    def __init__(self):
        self._dir = tempfile.mkdtemp(prefix="fake_pybullet_data_")

    def getDataPath(self):
        return self._dir


_instances = {}


def install():
    """Register fresh fake modules as pybullet / pybullet_data. Returns the
    FakePyBullet instance (also importable afterwards as ``pybullet``)."""
    fake = FakePyBullet()
    data = FakePyBulletData()
    _instances["pybullet"] = fake
    sys.modules["pybullet"] = fake
    sys.modules["pybullet_data"] = data
    return fake


def uninstall():
    sys.modules.pop("pybullet", None)
    sys.modules.pop("pybullet_data", None)
    _instances.clear()
