"""Model factory mirroring the reference (mmdyn/pytorch/models/models.py:13-25)."""

from __future__ import annotations

import jax

from mmdyn_tpu import config
from mmdyn_tpu.models.vae import VAE, MVAE
from mmdyn_tpu.models.regressor import Regressor


def setup_model(model_name, cross_modal=False, **kwargs):
    """name -> model module; MVAE requires cross-modal input (models.py:16-24)."""
    assert model_name in config.MODELS, "Model is not implemented yet"

    if "mvae" in model_name and cross_modal:
        return MVAE(**kwargs)
    if "vae" in model_name:
        assert not cross_modal, "VAE does not work with cross modal inputs."
        # the reference VAE accepts-and-ignores use_pose (vae.py:75); flax
        # modules reject unknown fields, so drop it here
        kwargs.pop("use_pose", None)
        return VAE(**kwargs)
    if "regressor" in model_name:
        return Regressor(**kwargs)
    raise ValueError("The model and modality combination is not valid.")


def count_parameters(params) -> int:
    """Total trainable parameter count of a flax params pytree."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
