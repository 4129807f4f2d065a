"""Inference/serving sessions: load a trained run, predict without a dataset.

The reference has no deployment story at all — a trained model can only be
reattached inside the training harness for manual analysis
(mmdyn/pytorch/problems/problems.py:68-83), which requires the full dataset
on disk and re-runs evaluation in training mode. ``InferenceSession`` is the
TPU-native serving path:

* loads params straight from an orbax checkpoint (template-free restore — no
  dataset, no optimizer state kept);
* deterministic by default: dropout off (the model is rebuilt with
  ``dropout_rate=0``, which leaves the param tree unchanged) and ``z`` = the
  posterior mean. BatchNorm stays batch-statistics — that IS the reference's
  own serving semantics (problems.py:174 evaluates under model.train()), so
  predictions depend mildly on the composition of the served batch;
  ``parity=True`` restores train-mode dropout too;
* one jitted program per (modality-presence, batch-shape) signature; AOT
  compilation via :meth:`aot_predict` for latency-critical callers;
* closed-loop :meth:`rollout` for the dynamics models (``lax.scan`` over the
  one-step predictor — a capability the reference never wired up: its
  DynModeling trains one-step transitions, problems.py:760-803, but offers
  no way to iterate them).

Modality subsets follow the MVAE's product-of-experts semantics
(vae.py:126-165): any non-None subset of (visual, tactile, pose) fuses with
the prior expert; absent modalities are simply not encoded.
"""

from __future__ import annotations

import functools
import warnings
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmdyn_tpu.models.factory import setup_model
from mmdyn_tpu.ops.poe import product_of_experts, reparametrize
from mmdyn_tpu.parallel.mesh import batch_sharding, replicate, shard_batch
from mmdyn_tpu.problems.base import ProblemConfig
from mmdyn_tpu.utils.runs import config_from_args, load_run_args

IMAGE_SHAPE = (64, 64, 3)
POSE_DIM = 7
_CNN_TRUNK = 512  # cnn encoder/regressor trunk width before condition concat
_MLP_TRUNK = 256  # mlp encoder last hidden width (models/vae.py layer_sizes)


def _infer_condition_dim(cfg: ProblemConfig, params) -> Optional[int]:
    """Recover the shock-force width from the checkpoint's param shapes.

    condition_dim is probed from the dataset at train time
    (train/loop.py:104-106) and is not in problem.pkl; serving must not need
    the dataset. The condition concat happens between the encoder trunk and
    the first head (models/vae.py:112-117, models/regressor.py:52-56), so
    the head's fan-in exposes it: trunk width 512 for cnn, 256 for the mlp
    encoder's last hidden layer.
    """
    if not cfg.conditional:
        return None
    if cfg.problem_type == "regression":
        head = params["out_0"]["kernel"]
        trunk = _CNN_TRUNK
    else:
        enc = params.get("visual_encoder") or params.get("encoder")
        head = enc["linear_means"]["kernel"]
        trunk = (_MLP_TRUNK if cfg.model_name.split("-")[0] == "mlp"
                 else _CNN_TRUNK)
    return int(head.shape[0]) - trunk


class InferenceSession:
    """Deterministic (by default) forward-only access to a trained model."""

    def __init__(self, cfg: ProblemConfig, params, parity: bool = False,
                 mesh=None, bn_stats=None, norms=None):
        self.cfg = cfg
        self.norms = norms or {}  # dataset min-max constants (norms.json)
        self.parity = parity
        self.mesh = mesh  # data-parallel serving: batch sharded, params
                          # replicated; the same jitted program runs SPMD
        kwargs = {} if parity else {"dropout_rate": 0.0}
        if bn_stats is not None:
            # frozen-statistics BatchNorm: per-example deterministic serving
            # (see freeze_bn); param tree unchanged, stats ride a separate
            # flax collection
            kwargs["bn_mode"] = "frozen"
        if cfg.problem_type == "regression":
            self.model = setup_model(cfg.model_name, out_dim=POSE_DIM,
                                     conditional=cfg.conditional,
                                     condition_dim=cfg.condition_dim,
                                     compute_dtype=cfg.compute_dtype, **kwargs)
        else:
            mk = dict(latent_size=cfg.latent_size,
                      architecture=cfg.model_name.split("-")[0],
                      conditional=cfg.conditional,
                      categorical_conditions=cfg.categorical_conditions,
                      condition_dim=cfg.condition_dim,
                      compute_dtype=cfg.compute_dtype, **kwargs)
            if cfg.is_mvae:
                mk["use_pose"] = cfg.use_pose
            else:
                mk["input_dim"] = 64 * 64
            self.model = setup_model(cfg.model_name,
                                     cross_modal=cfg.cross_modal, **mk)
        place = ((lambda t: replicate(mesh, t)) if mesh is not None
                 else jax.device_put)
        self.params = place(params)
        self.bn_stats = place(bn_stats) if bn_stats is not None else None
        self._aot_cache = {}

    @property
    def variables(self):
        """The flax variables dict every compiled predictor takes as its
        first argument: {'params': ...} plus 'bn_stats' when frozen."""
        if self.bn_stats is not None:
            return {"params": self.params, "bn_stats": self.bn_stats}
        return {"params": self.params}

    # ------------------------------------------------------------------
    @classmethod
    def from_run(cls, run_dir, parity: bool = False, compute_dtype=None,
                 checkpoint: Optional[str] = None, mesh=None):
        """Load <run>/problem.pkl + the latest (or named) checkpoint.

        Unlike cli/evaluate.py this touches neither the dataset nor the
        optimizer: the checkpoint is restored template-free and only
        ``params`` are kept.
        """
        import orbax.checkpoint as ocp

        from mmdyn_tpu.train.checkpoint import latest_checkpoint

        run_dir = Path(run_dir)
        cfg = config_from_args(load_run_args(run_dir),
                               compute_dtype=compute_dtype)
        ckpt_dir = run_dir / "checkpoint"
        path = (ckpt_dir / checkpoint if checkpoint
                else latest_checkpoint(ckpt_dir))
        if path is None or not Path(path).exists():
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        # restore as host numpy (not StandardCheckpointer's sharded arrays):
        # a checkpoint written on TPU must load on a CPU-only serving host
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(Path(path).absolute()).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        restored = ckptr.restore(Path(path).absolute(),
                                 restore_args=restore_args)
        params = restored["state"]["params"]
        import dataclasses
        norms = None
        if (run_dir / "norms.json").exists():
            import json
            with open(run_dir / "norms.json") as f:
                norms = json.load(f)
        if norms is not None and "condition_dim" in norms:
            # recorded at train time (train/loop.py) — authoritative; the
            # param-shape probe below stays as the fallback for runs that
            # predate the field
            condition_dim = norms["condition_dim"]
        else:
            condition_dim = _infer_condition_dim(cfg, params)
        cfg = dataclasses.replace(cfg, condition_dim=condition_dim)
        return cls(cfg, params, parity=parity, mesh=mesh, norms=norms)

    # ------------------------------------------------------------------
    @classmethod
    def from_torch_ckpt(cls, ckpt_path, problem_type="seq_modeling",
                        model_name="cnn-mvae", input_type="visuotactile",
                        conditional=False, parity=False, mesh=None,
                        norms=None, compute_dtype="float32"):
        """Serve a REFERENCE-trained torch checkpoint directly.

        Takes the reference's ``torch.save({'model': state_dict, ...})``
        files (problems.py:580-586) and builds a session on the converted
        weights (utils/torch_compat.py handles the NCHW->NHWC and
        correlated-deconv layout moves) — a reference user's existing
        models run on TPU with no retraining. latent_size and use_pose are
        inferred from the state_dict; condition_dim from the head fan-in.
        """
        import torch

        from mmdyn_tpu.utils.torch_compat import from_torch_state_dict

        blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = blob["model"] if isinstance(blob, dict) and "model" in blob else blob
        sd = {k: (v.detach().numpy() if hasattr(v, "detach") else
                  np.asarray(v)) for k, v in sd.items()}
        params = from_torch_state_dict(model_name, sd)

        if problem_type == "regression":
            latent = 256  # unused
            use_pose = False
        else:
            enc = params.get("visual_encoder") or params.get("encoder")
            latent = int(enc["linear_means"]["kernel"].shape[1])
            use_pose = "pose_encoder" in params
        import dataclasses

        cfg = ProblemConfig(problem_type=problem_type, model_name=model_name,
                            input_type=input_type, use_pose=use_pose,
                            conditional=conditional, latent_size=latent,
                            compute_dtype=compute_dtype)
        cfg = dataclasses.replace(
            cfg, condition_dim=_infer_condition_dim(cfg, params))
        return cls(cfg, params, parity=parity, mesh=mesh, norms=norms)

    # ------------------------------------------------------------------
    # pure prediction cores (one jit cache entry per presence signature)

    def _rngs(self, rng):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        kd, kr = jax.random.split(rng)
        return {"dropout": kd}, kr

    def _posterior(self, variables, inputs, condition, rngs):
        """Joint PoE posterior over the present modalities (vae.py:126-165)."""
        model = self.model
        mcls = type(model)

        def apply(method, *a, **kw):
            return model.apply(variables, *a, method=method, rngs=rngs, **kw)

        if not self.cfg.is_mvae:
            x = inputs["visual" if "visual" in inputs else "tactile"]
            if self.cfg.model_name.split("-")[0] == "mlp":
                # vae.py:82-83 view(-1, input_dim): channel planes fold into
                # the batch axis (see models/vae.py VAE.__call__)
                x = jnp.reshape(jnp.transpose(x, (0, 3, 1, 2)), (-1, 64 * 64))
            return apply(mcls.encode, x, condition)

        mus, lvs = [], []
        if "visual" in inputs:
            mu, lv = apply(mcls.encode_visual, inputs["visual"], condition)
            mus.append(mu); lvs.append(lv)
        if "tactile" in inputs:
            mu, lv = apply(mcls.encode_tactile, inputs["tactile"], condition)
            mus.append(mu); lvs.append(lv)
        if "pose" in inputs:
            mu, lv = apply(mcls.encode_pose, inputs["pose"])
            mus.append(mu); lvs.append(lv)
        mus = [jnp.zeros_like(mus[0])] + mus       # prior expert N(0, I)
        lvs = [jnp.zeros_like(lvs[0])] + lvs
        return product_of_experts(jnp.stack(mus), jnp.stack(lvs))

    def _decode(self, variables, z, condition, rngs, uint8_images=False):
        """Decode z into every output modality; images sigmoided to [0, 1]
        (or quantized to uint8 on device — a 4x smaller serving payload,
        which matters through the tunnel's host<->device link)."""
        model = self.model
        mcls = type(model)

        def apply(method, *a, **kw):
            return model.apply(variables, *a, method=method, rngs=rngs, **kw)

        def img(logits):
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            if uint8_images:
                return jnp.round(probs * 255.0).astype(jnp.uint8)
            return probs

        if not self.cfg.is_mvae:
            out = apply(mcls.decode, z, condition)
            if self.cfg.model_name.split("-")[0] == "mlp":
                b = z.shape[0] // 3
                out = jnp.transpose(jnp.reshape(out, (b, 3, 64, 64)),
                                    (0, 2, 3, 1))
            return {self.cfg.input_type: img(out)}
        preds = {
            "visual": img(apply(mcls.decode_visual, z, condition)),
            "tactile": img(apply(mcls.decode_tactile, z, condition)),
        }
        if self.cfg.use_pose:
            preds["pose"] = apply(mcls.decode_pose, z).astype(jnp.float32)
        return preds

    def _predict_core(self, variables, inputs, condition, rng, sample,
                      uint8_images=False):
        rngs, k_rep = self._rngs(rng)
        if self.cfg.problem_type == "regression":
            out = self.model.apply(variables,
                                   inputs["visual" if "visual" in inputs
                                          else "tactile"],
                                   condition, rngs=rngs)
            return {"pose": out.astype(jnp.float32)}
        mu, lv = self._posterior(variables, inputs, condition, rngs)
        z = reparametrize(k_rep, mu, lv) if sample else mu
        preds = self._decode(variables, z, condition, rngs,
                             uint8_images=uint8_images)
        if (not self.cfg.is_mvae
                and self.cfg.model_name.split("-")[0] == "mlp"):
            # the mlp fold put channel planes on the batch axis (row order
            # b*3 + c); group the per-plane posteriors back per input row so
            # every output's leading axis is the request batch
            b = next(iter(inputs.values())).shape[0]
            mu = jnp.reshape(mu, (b, 3, -1))
            lv = jnp.reshape(lv, (b, 3, -1))
        preds["mu"], preds["logvar"] = mu, lv
        return preds

    @functools.cached_property
    def _jit_predict(self):
        # one jitted entry per (modality-presence pytree, shapes, sample flag)
        # — jax.jit keys its cache on the input pytree structure, so distinct
        # presence patterns trace separately without bookkeeping here
        return jax.jit(self._predict_core, static_argnums=(4, 5))

    @functools.cached_property
    def _jit_sample(self):
        def fn(variables, rng, n, cond, uint8_images):
            kz, kd = jax.random.split(rng)
            z = jax.random.normal(kz, (n, self.cfg.latent_size))
            return self._decode(variables, z, cond, {"dropout": kd},
                                uint8_images=uint8_images)

        return jax.jit(fn, static_argnums=(2, 4))

    # ------------------------------------------------------------------
    def _gather(self, visual, tactile, pose):
        inputs = {}
        if visual is not None:
            inputs["visual"] = jnp.asarray(visual)
        if tactile is not None:
            inputs["tactile"] = jnp.asarray(tactile)
        if pose is not None and self.cfg.use_pose:
            inputs["pose"] = jnp.asarray(pose)
        if not inputs:
            raise ValueError("at least one input modality is required")
        if (not self.cfg.is_mvae and self.cfg.problem_type != "regression"
                and self.cfg.input_type not in inputs):
            # a single-modality VAE's encoder was trained on input_type;
            # feeding the other image stream would silently decode garbage
            raise ValueError(f"this {self.cfg.model_name} was trained on "
                             f"'{self.cfg.input_type}' input; got "
                             f"{sorted(inputs)}")
        if self.mesh is not None:
            # shard the serving batch across the mesh; jit picks the layout
            # up from the inputs and runs the program SPMD
            inputs = shard_batch(self.mesh, inputs)
        return inputs

    def _gather_condition(self, condition):
        if not self.cfg.conditional:
            return None
        if condition is None:
            # fail with intent, not with a mid-trace shape error: the heads
            # were trained on trunk+condition fan-in (models/vae.py:112-117)
            raise ValueError(
                f"this model is conditional (condition_dim="
                f"{self.cfg.condition_dim}); pass condition=(B, "
                f"{self.cfg.condition_dim})")
        return jnp.asarray(condition)

    def predict(self, visual=None, tactile=None, pose=None, condition=None,
                rng=None, sample=False, uint8_images=False):
        """One forward prediction from any present modality subset.

        For seq/dyn models this is the resting-state / next-state prediction
        the problem was trained on; for plain reconstruction it is the
        autoencoded input; for regression the 7-D pose estimate.

        Images are (B, 64, 64, 3) float in [0, 1] (uint8 0-255 with
        ``uint8_images=True`` — quantized on device, 4x smaller readback);
        pose is in the dataset's normalized pose space (min-max constants
        live with the dataset). Returns a dict of predictions plus the joint
        posterior (mu, logvar).
        """
        inputs = self._gather(visual, tactile, pose)
        cond = self._gather_condition(condition)
        return self._jit_predict(self.variables, inputs, cond, rng,
                                 bool(sample), bool(uint8_images))

    def denormalize_pose(self, pose):
        """Invert the dataset's min-max pose normalisation
        (datasets.py:244-253): x = lo + pose * (hi - lo). Requires the run
        to carry norms.json (written at train time since round 3); raises
        otherwise."""
        if "pose_min" not in self.norms:
            raise ValueError(
                "no normalisation constants: the run predates norms.json "
                "(re-train, or pass norms= to InferenceSession)")
        lo = np.asarray(self.norms["pose_min"], np.float32)
        hi = np.asarray(self.norms["pose_max"], np.float32)
        return np.asarray(pose, np.float32) * (hi - lo) + lo

    def normalize_pose(self, pose):
        """Forward min-max normalisation for feeding raw poses in."""
        if "pose_min" not in self.norms:
            raise ValueError("no normalisation constants (see denormalize_pose)")
        lo = np.asarray(self.norms["pose_min"], np.float32)
        hi = np.asarray(self.norms["pose_max"], np.float32)
        rng = hi - lo
        rng[rng == 0] = 1.0
        return (np.asarray(pose, np.float32) - lo) / rng

    def encode(self, visual=None, tactile=None, pose=None, condition=None):
        """Joint posterior (mu, logvar) of the present modalities."""
        out = self.predict(visual, tactile, pose, condition)
        return out["mu"], out["logvar"]

    def sample_prior(self, n, rng, condition=None, uint8_images=False):
        """Decode n prior samples z ~ N(0, I) (problems.py:548-559)."""
        if self.cfg.problem_type == "regression":
            raise ValueError("regression models have no latent space")
        cond = self._gather_condition(condition)
        return self._jit_sample(self.variables, rng, int(n), cond,
                                bool(uint8_images))

    # ------------------------------------------------------------------
    def rollout(self, steps, visual=None, tactile=None, pose=None,
                condition=None, rng=None, sample=False, uint8_images=False):
        """Iterate the one-step predictor closed-loop for ``steps`` steps.

        Each step feeds the predicted modalities back as the next input
        (images as [0, 1] probabilities — the space the dyn targets live in).
        Returns a dict of (steps, B, ...) trajectories. New capability: the
        reference trains one-step dynamics (problems.py:760-803) but has no
        rollout machinery.
        """
        if self.cfg.problem_type == "regression":
            raise ValueError("rollout needs a generative model (the "
                             "regressor's pose output cannot be fed back)")
        inputs = self._gather(visual, tactile, pose)
        cond = self._gather_condition(condition)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._jit_rollout(self.variables, inputs, cond, rng,
                                 int(steps), bool(sample),
                                 bool(uint8_images))

    @functools.cached_property
    def _jit_rollout(self):
        def fn(variables, init, cond, rng, steps, sample, uint8_images):
            keep = tuple(sorted(init))

            def step(carry, key):
                preds = self._predict_core(variables, carry, cond, key, sample)
                nxt = {k: preds[k] for k in keep}
                return nxt, {k: preds[k] for k in preds
                             if k in keep or k in ("mu", "logvar")}

            ys = jax.lax.scan(step, init, jax.random.split(rng, steps))[1]
            if uint8_images:
                # feedback stays float inside the scan; only the returned
                # trajectory is quantized (same payload contract as predict)
                ys = {k: (jnp.round(v * 255.0).astype(jnp.uint8)
                          if v.ndim == 5 else v)
                      for k, v in ys.items()}
            return ys

        return jax.jit(fn, static_argnums=(4, 5, 6))

    # ------------------------------------------------------------------
    def freeze_bn(self, visual=None, tactile=None, pose=None, condition=None,
                  rng=None) -> "InferenceSession":
        """Calibrate BatchNorm and return a frozen-statistics session.

        The models carry no running statistics by design (the reference
        always evaluates in train mode, problems.py:174, so
        layers.TrainBatchNorm is stateless). That makes batch-mode serving
        depend on the composition of the served batch — including padding
        rows and, under request coalescing, OTHER requests' data. This
        runs one calibration pass over the given batch (every encoder and
        decoder executes once), captures each BN layer's statistics into a
        ``bn_stats`` collection, and returns a new session whose predictions
        are per-example deterministic (and reduction-free, so cheaper).

        Use a calibration batch representative of the training data — e.g.
        a few hundred frames from the training dump.
        """
        if self.cfg.problem_type == "regression":
            collect = setup_model(self.cfg.model_name, out_dim=POSE_DIM,
                                  conditional=self.cfg.conditional,
                                  condition_dim=self.cfg.condition_dim,
                                  compute_dtype=self.cfg.compute_dtype,
                                  dropout_rate=0.0, bn_mode="collect")
        else:
            mk = dict(latent_size=self.cfg.latent_size,
                      architecture=self.cfg.model_name.split("-")[0],
                      conditional=self.cfg.conditional,
                      categorical_conditions=self.cfg.categorical_conditions,
                      condition_dim=self.cfg.condition_dim,
                      compute_dtype=self.cfg.compute_dtype,
                      dropout_rate=0.0, bn_mode="collect")
            if self.cfg.is_mvae:
                mk["use_pose"] = self.cfg.use_pose
            else:
                mk["input_dim"] = 64 * 64
            collect = setup_model(self.cfg.model_name,
                                  cross_modal=self.cfg.cross_modal, **mk)

        if rng is None:
            rng = jax.random.PRNGKey(0)
        kd, kr = jax.random.split(rng)
        rngs = {"dropout": kd, "reparam": kr}
        params = jax.device_get(self.params)  # host copy; re-placed below
        cond = (jnp.asarray(condition)
                if (condition is not None and self.cfg.conditional) else None)
        if self.cfg.problem_type == "regression":
            x = visual if visual is not None else tactile
            _, muts = collect.apply({"params": params}, jnp.asarray(x), cond,
                                    rngs=rngs, mutable=["bn_stats"])
        elif self.cfg.is_mvae:
            if visual is None or tactile is None:
                raise ValueError("MVAE calibration needs visual AND tactile "
                                 "(every BN layer must execute)")
            p = (jnp.asarray(pose) if (pose is not None and self.cfg.use_pose)
                 else None)
            _, muts = collect.apply({"params": params},
                                    [jnp.asarray(visual), jnp.asarray(tactile)],
                                    p, cond, rngs=rngs, mutable=["bn_stats"])
        else:
            x = visual if visual is not None else tactile
            _, muts = collect.apply({"params": params}, jnp.asarray(x), cond,
                                    rngs=rngs, mutable=["bn_stats"])
        bn_stats = muts.get("bn_stats")
        if not bn_stats:
            # BN-free architectures (mlp encoder/decoder stacks) have nothing
            # to calibrate: the session is already per-example deterministic.
            warnings.warn("freeze_bn: model has no BatchNorm layers; "
                          "returning the session unchanged", stacklevel=2)
            return self
        return InferenceSession(self.cfg, params, parity=self.parity,
                                mesh=self.mesh, bn_stats=bn_stats,
                                norms=self.norms)

    # ------------------------------------------------------------------
    def aot_predict(self, batch_size, modalities=("visual", "tactile"),
                    conditional=False, sample=False, uint8_images=False):
        """Ahead-of-time compile the predictor for a fixed batch size.

        Returns a ``jax.stages.Compiled`` executable of
        ``(variables, inputs, condition, rng) -> predictions`` (pass
        ``session.variables``) — no tracing or compile on the serving hot
        path, stable latency from the first call.
        """
        key = (int(batch_size), tuple(sorted(modalities)), bool(conditional),
               bool(sample), bool(uint8_images))
        if key in self._aot_cache:
            return self._aot_cache[key]
        in_sharding = (batch_sharding(self.mesh)
                       if self.mesh is not None else None)
        specs = {}
        for m in modalities:
            shape = ((batch_size, POSE_DIM) if m == "pose"
                     else (batch_size,) + IMAGE_SHAPE)
            specs[m] = jax.ShapeDtypeStruct(shape, jnp.float32,
                                            sharding=in_sharding)
        cond_spec = None
        if conditional and self.cfg.conditional:
            cond_spec = jax.ShapeDtypeStruct(
                (batch_size, self.cfg.condition_dim), jnp.float32)
        rng_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
        var_spec = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), self.variables)

        @jax.jit
        def fn(variables, inputs, condition, rng):
            return self._predict_core(variables, inputs, condition, rng,
                                      sample, uint8_images)

        compiled = fn.lower(var_spec, specs, cond_spec, rng_spec).compile()
        self._aot_cache[key] = compiled
        return compiled
