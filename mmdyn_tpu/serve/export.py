"""Portable serving artifacts via jax.export (StableHLO).

``export_session`` freezes an InferenceSession's predictor for a fixed batch
size into a self-contained directory:

    predict.stablehlo   serialized jax.export.Exported of
                        (params, inputs, condition, rng) -> predictions
    params.msgpack      the checkpoint params (flax msgpack — no orbax needed
                        at load time)
    manifest.json       shapes, modalities, platforms, config provenance

``load_exported`` runs it with no model code, no flax modules and no
checkpoint machinery — only jax + the serialized bytes. This is the
deployment hand-off the reference lacks entirely (its checkpoints are raw
``torch.save`` state_dicts that require the full training package to
reconstruct the module tree, problems.py:580-586).

Artifacts are lowered for every requested platform (default: cpu + tpu when
exportable) — one file serves both a CPU canary and the TPU fleet.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import numpy as np

MANIFEST = "manifest.json"
MODULE = "predict.stablehlo"
PARAMS = "params.msgpack"


def export_session(session, out_dir, batch_size=1,
                   modalities=None, conditional=False,
                   sample=False, platforms=None):
    """Serialize the session's predictor for a fixed batch size.

    ``modalities=None`` derives the input set from the session's config.
    Returns the manifest dict. ``platforms=None`` tries ("cpu", "tpu") and
    falls back to the current backend if multi-platform lowering fails.
    """
    import flax.serialization as fserial
    from jax import export as jexport

    from mmdyn_tpu.serve.session import IMAGE_SHAPE, POSE_DIM

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    cfg = session.cfg
    if modalities is None:
        modalities = (("visual", "tactile") if cfg.cross_modal
                      else (cfg.input_type,))
        if cfg.use_pose:
            modalities = modalities + ("pose",)
    modalities = tuple(sorted(modalities))
    if (not cfg.is_mvae and cfg.problem_type != "regression"
            and tuple(m for m in modalities if m != "pose")
            != (cfg.input_type,)):
        # same guard as InferenceSession._gather: a single-modality VAE
        # artifact must take exactly the stream it was trained on
        raise ValueError(f"this {cfg.model_name} was trained on "
                         f"'{cfg.input_type}' input; got {modalities}")

    specs = {}
    for m in modalities:
        shape = ((batch_size, POSE_DIM) if m == "pose"
                 else (batch_size,) + IMAGE_SHAPE)
        specs[m] = jax.ShapeDtypeStruct(shape, np.float32)
    cond_spec = None
    if conditional and cfg.conditional:
        cond_spec = jax.ShapeDtypeStruct((batch_size, cfg.condition_dim),
                                         np.float32)
    rng_spec = jax.ShapeDtypeStruct((2,), np.uint32)
    var_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), session.variables)

    fn = jax.jit(lambda variables, inputs, condition, rng:
                 session._predict_core(variables, inputs, condition, rng,
                                       bool(sample)))

    tried = [tuple(platforms)] if platforms else [("cpu", "tpu"),
                                                 (jax.default_backend(),)]
    exported = err = None
    for plats in tried:
        try:
            exported = jexport.export(fn, platforms=plats)(
                var_spec, specs, cond_spec, rng_spec)
            break
        except Exception as e:  # multi-platform lowering can be unsupported
            err = e
    if exported is None:
        raise RuntimeError(f"export failed for {tried}: {err}")

    (out_dir / MODULE).write_bytes(exported.serialize())
    vars_np = jax.tree_util.tree_map(np.asarray, session.variables)
    (out_dir / PARAMS).write_bytes(fserial.msgpack_serialize(vars_np))

    manifest = {
        "batch_size": int(batch_size),
        "modalities": list(modalities),
        "conditional": bool(conditional and cfg.conditional),
        "sample": bool(sample),
        "platforms": list(exported.platforms),
        "outputs": sorted(jax.eval_shape(
            fn, var_spec, specs, cond_spec, rng_spec)),
        "frozen_bn": session.bn_stats is not None,
        "config": dataclasses.asdict(cfg),
        "jax_version": jax.__version__,
    }
    with open(out_dir / MANIFEST, "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedPredictor:
    """A loaded artifact: ``preds = predictor(visual=..., tactile=...)``."""

    def __init__(self, exported, params, manifest):
        self._call = jax.jit(exported.call)
        self._params = params
        self.manifest = manifest

    def __call__(self, condition=None, rng=None, **inputs):
        import jax.numpy as jnp

        want = set(self.manifest["modalities"])
        got = {}
        for k, v in inputs.items():
            if v is None:
                continue
            arr = np.asarray(v)
            if arr.dtype == np.uint8:
                # same wire convention as the HTTP server: uint8 images are
                # 0-255 and must be scaled before the encoder sees them
                arr = arr.astype(np.float32) / 255.0
            got[k] = jnp.asarray(arr, jnp.float32)
        if set(got) != want:
            raise ValueError(f"artifact expects modalities {sorted(want)}, "
                             f"got {sorted(got)}")
        cond = None
        if self.manifest["conditional"]:
            if condition is None:
                raise ValueError("artifact expects a condition")
            cond = jnp.asarray(condition, jnp.float32)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._call(self._params, got, cond, rng)


def load_exported(out_dir) -> ExportedPredictor:
    """Deserialize an exported artifact; needs only jax (+flax msgpack)."""
    import flax.serialization as fserial
    from jax import export as jexport

    out_dir = Path(out_dir)
    with open(out_dir / MANIFEST) as f:
        manifest = json.load(f)
    exported = jexport.deserialize((out_dir / MODULE).read_bytes())
    params = fserial.msgpack_restore((out_dir / PARAMS).read_bytes())
    return ExportedPredictor(exported, params, manifest)
