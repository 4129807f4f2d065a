"""Train state: a pure pytree of (step, params, opt_state).

The reference keeps optimizer state inside torch modules; here it is explicit
so the whole training step is a pure function (params in, params out) with
buffer donation — XLA updates weights in place in HBM.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))
