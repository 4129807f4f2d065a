"""Deployment and serving: forward-only sessions, AOT compilation, and
portable `jax.export` artifacts for trained runs.

The reference stops at training + manual reattachment
(mmdyn/pytorch/problems/problems.py:68-83); this package is the production
path a TPU deployment needs: load params without the dataset, predict from
any modality subset, iterate dynamics closed-loop, and ship a serialized
StableHLO artifact that runs without the model code.
"""

from mmdyn_tpu.serve.session import InferenceSession
from mmdyn_tpu.serve.export import export_session, load_exported

__all__ = ["InferenceSession", "export_session", "load_exported"]
