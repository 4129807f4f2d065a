"""Problem specs: pure-functional (params, batch, rng) -> (loss, metrics).

The reference's Problem classes (mmdyn/pytorch/problems/problems.py) mix
orchestration with math; here the math lives in jittable functions and the
orchestration in mmdyn_tpu.train.loop.
"""

from mmdyn_tpu.problems.base import ProblemConfig, anneal_kl, make_optimizer
from mmdyn_tpu.problems.specs import (
    parse_batch,
    evaluate,
    PROBLEM_PARSERS,
)
from mmdyn_tpu.problems.reconstruction import mvae_evaluate, vae_evaluate
