"""Training: state, jitted steps, checkpoints (with resume), metrics, loop."""

from mmdyn_tpu.train.state import TrainState, create_train_state
from mmdyn_tpu.train.steps import make_train_step, make_eval_step, make_sample_fn
from mmdyn_tpu.train.checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint
from mmdyn_tpu.train.loop import Problem
