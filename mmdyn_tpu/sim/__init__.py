"""Host-side visuotactile STS simulator.

Port of the reference's mmdyn/tact_sim with a backend split:

* pure math (no sim engine): ``camera`` (OpenGL-convention pipeline,
  vectorised), ``shader`` (Phong), ``normals`` (depth-gradient normal
  estimation replacing Open3D), ``geometry``/``transforms`` (pose algebra via
  scipy), ``utils`` (PointCloud / ImageBuffer / Video), ``ros_camera``.
* physics/render backends: PyBullet (lazily imported) or the built-in
  analytic engine (``physics.AnalyticBackend``) — a small rigid-body +
  raycast renderer so experiments run in environments without Bullet.
* ``sensor`` — Sensor / TactileSensor / make_sensor over either backend.
"""

from mmdyn_tpu.sim import config
