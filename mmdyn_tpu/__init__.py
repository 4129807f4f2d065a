"""mmdyn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multimodal-dynamics framework.

A ground-up rebuild of the capabilities of SAIC-MONTREAL/multimodal-dynamics
("Learning Intuitive Physics with Multimodal Generative Models", AAAI 2021):

* ``mmdyn_tpu.models``   — VAE / multimodal-VAE (product-of-experts) / regressor
  model families (flax.linen, NHWC, MXU-friendly).
* ``mmdyn_tpu.ops``      — pure-functional numerics: PoE fusion, reparameterisation,
  ELBO / subset-ELBO losses, fused Pallas kernels.
* ``mmdyn_tpu.problems`` — problem specs (regression / reconstruction /
  seq_modeling / dyn_modeling) as jittable batch transforms + loss functions.
* ``mmdyn_tpu.data``     — compiled-dataset pipeline: host compile of simulator
  dumps -> packed arrays, double-buffered device prefetch, synthetic backend.
* ``mmdyn_tpu.parallel`` — device mesh / sharding helpers (pure-DP over ICI,
  growable to multi-host).
* ``mmdyn_tpu.train``    — train state, jitted train/eval steps, checkpointing
  (with resume), metric writers.
* ``mmdyn_tpu.sim``      — host-side visuotactile STS simulator: OpenGL-convention
  camera, vectorised Phong shader, depth-gradient normals, tactile sensor
  emulation, PyBullet integration (lazily imported) + analytic fallback physics.
* ``mmdyn_tpu.cli``      — entry points mirroring the reference CLI surface.

Reference behaviour citations in docstrings use ``<file>:<line>`` paths relative
to the upstream repo (mmdyn/...).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level convenience API (keeps `import mmdyn_tpu` light)."""
    if name in ("Problem",):
        from mmdyn_tpu.train.loop import Problem
        return Problem
    if name in ("ProblemConfig",):
        from mmdyn_tpu.problems.base import ProblemConfig
        return ProblemConfig
    if name in ("setup_model", "count_parameters"):
        from mmdyn_tpu.models import factory
        return getattr(factory, name)
    if name in ("dataset_setup",):
        from mmdyn_tpu.data.dataset import dataset_setup
        return dataset_setup
    if name in ("make_mesh",):
        from mmdyn_tpu.parallel.mesh import make_mesh
        return make_mesh
    raise AttributeError(name)
