"""CNN pose regressor baseline (mmdyn/pytorch/models/models.py:28-77).

DCGAN-style conv trunk identical to the VAE encoder, FC 6400 -> 512 + Swish +
Dropout(0.1), optional shock-condition concat, then an MLP head
512(+cond) -> 256 -> 256 -> out_dim (default 7-D pose).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from mmdyn_tpu.config import DROPOUT_RATE
from mmdyn_tpu.models.layers import Conv2d, Dense, TrainBatchNorm, swish


class Regressor(nn.Module):
    out_dim: int = 7
    conditional: bool = False
    condition_dim: Optional[int] = None
    dropout_rate: float = DROPOUT_RATE
    compute_dtype: str = "float32"
    bn_mode: str = "batch"   # serving knob; see layers.TrainBatchNorm

    @nn.compact
    def __call__(self, x, c=None):
        dt = self.compute_dtype
        bn = self.bn_mode
        x = Conv2d(32, 4, 2, 1, use_bias=False, name="conv_0",
                   compute_dtype=dt)(x)
        x = swish(x)
        x = Conv2d(64, 4, 2, 1, use_bias=False, name="conv_1",
                   compute_dtype=dt)(x)
        x = TrainBatchNorm(name="bn_1", mode=bn)(x)
        x = swish(x)
        x = Conv2d(128, 4, 2, 1, use_bias=False, name="conv_2",
                   compute_dtype=dt)(x)
        x = TrainBatchNorm(name="bn_2", mode=bn)(x)
        x = swish(x)
        x = Conv2d(256, 4, 1, 0, use_bias=False, name="conv_3",
                   compute_dtype=dt)(x)
        x = TrainBatchNorm(name="bn_3", mode=bn)(x)
        x = swish(x)
        x = jnp.reshape(x, (x.shape[0], -1))
        x = Dense(512, name="fc", compute_dtype=dt)(x)
        x = swish(x)
        x = nn.Dropout(self.dropout_rate, deterministic=False)(x)

        if self.conditional and c is not None:
            if c.ndim == 1:
                c = c[:, None]
            x = jnp.concatenate([x, c.astype(x.dtype)], axis=-1)

        x = Dense(256, name="out_0", compute_dtype=dt)(x)
        x = jax.nn.relu(x)
        x = Dense(256, name="out_1", compute_dtype=dt)(x)
        x = jax.nn.relu(x)
        # pose output in f32 regardless of the activation policy (MSE loss)
        return Dense(self.out_dim, name="out_2",
                     compute_dtype=dt)(x).astype(jnp.float32)
