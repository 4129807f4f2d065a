"""Pure-functional numerics shared by models and problems."""

from mmdyn_tpu.ops.poe import product_of_experts, prior_expert, reparametrize, masked_poe
from mmdyn_tpu.ops.losses import (
    bce_with_logits,
    mse,
    kl_divergence,
    elbo_loss,
    mvae_elbo_loss,
)
