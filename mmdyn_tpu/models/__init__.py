"""Model families: VAE, multimodal VAE (PoE), regressor."""

from mmdyn_tpu.models.factory import setup_model, count_parameters
from mmdyn_tpu.models.vae import VAE, MVAE, Encoder, Decoder
from mmdyn_tpu.models.regressor import Regressor
