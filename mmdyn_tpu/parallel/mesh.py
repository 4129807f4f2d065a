"""Device mesh and sharding layout.

The reference is strictly single-device (problems.py:52; SURVEY.md section 2.3
— no DP/TP/PP anywhere). The TPU framework scales by pure data parallelism
over a 1-D ``('data',)`` mesh:

* batches are sharded on their leading axis across the mesh;
* parameters and optimizer state are replicated;
* the jitted train step runs SPMD — XLA inserts the gradient ``psum`` over ICI
  automatically from the sharding layout (no hand-written collectives needed
  at this model scale; see jax-ml.github.io/scaling-book).

The mesh abstraction is 1-D here but nothing below assumes a single host.
Multi-host DP entry: call ``jax.distributed.initialize()`` on every host
before building the mesh (``jax.devices()`` then spans all hosts), and the
data layer does the rest — each host's ``BatchLoader`` materialises its own
row block of the global batch (``process_index/process_count``, wired
automatically by ``dataset_setup``) and ``to_device_batch`` assembles the
global jax.Array via ``jax.make_array_from_process_local_data`` with no
cross-host data motion. Per-shard content correctness of that convention is
asserted by tests/test_train.py::TestMultiHostLoader.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmdyn_tpu.config import DEFAULT_MESH_AXIS


def make_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None,
              axis_name: str = DEFAULT_MESH_AXIS,
              mesh_shape: Optional[Sequence[int]] = None,
              axis_names: Optional[Sequence[str]] = None) -> Mesh:
    """Data-parallel mesh over the first ``num_devices`` devices.

    1-D ``('data',)`` by default. Pass ``mesh_shape`` (e.g. ``(2, 4)``) for a
    multi-axis layout — axes default to ``('replica', 'data')`` for 2-D,
    mirroring a multi-host DP arrangement (outer axis = hosts over DCN, inner
    = chips over ICI). The batch still shards over every axis (pure DP); the
    shape only changes the device→shard mapping, proving the abstraction
    supports multi-host growth (SURVEY.md section 2.3).
    """
    if devices is None:
        devices = jax.devices()
    if mesh_shape is not None:
        n = int(np.prod(mesh_shape))
        if num_devices is not None and num_devices != n:
            raise ValueError(f"mesh_shape {tuple(mesh_shape)} needs {n} "
                             f"devices, num_devices={num_devices}")
        if axis_names is None:
            axis_names = (("replica", axis_name) if len(mesh_shape) == 2 else
                          tuple(f"axis{i}" for i in range(len(mesh_shape) - 1))
                          + (axis_name,))
        dev_array = np.asarray(devices[:n]).reshape(tuple(mesh_shape))
        return Mesh(dev_array, tuple(axis_names))
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: Optional[str] = None) -> NamedSharding:
    """Leading-axis sharding for batch pytrees (over ALL mesh axes)."""
    axes = (axis_name,) if axis_name is not None else tuple(mesh.axis_names)
    return NamedSharding(mesh, P(axes))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a batch pytree with its leading axis split across the mesh."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))
