"""Train-layer tests: jitted steps, checkpoint save/resume, full loop,
multi-device DP, CLI smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdyn_tpu.data.synthetic import make_compiled_arrays, make_synthetic_dumps
from mmdyn_tpu.models import setup_model
from mmdyn_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from mmdyn_tpu.problems.base import ProblemConfig, make_optimizer
from mmdyn_tpu.train.checkpoint import (latest_checkpoint, restore_checkpoint,
                                        save_checkpoint)
from mmdyn_tpu.train.loop import Problem
from mmdyn_tpu.train.state import create_train_state
from mmdyn_tpu.train.steps import make_eval_step, make_train_step


def _small_cfg(**kw):
    base = dict(problem_type="seq_modeling", model_name="cnn-vae",
                input_type="visual", latent_size=16, batchsize=4,
                num_epochs=2, annealing_epochs=2)
    base.update(kw)
    return ProblemConfig(**base)


def _batch(B=4, T=3, S=1, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.array(rng.uniform(size=s).astype(np.float32))
    return {
        "visual": f(B, T, 64, 64, 3), "tactile": f(B, T, 64, 64, 3),
        "pose": f(B, T, 7), "avail": f(B, T, 2), "shock": f(B, T, S),
        "final_visual": f(B, 64, 64, 3), "final_tactile": f(B, 64, 64, 3),
        "final_pose": f(B, 7), "seg": f(B, T, 64, 64, 3),
    }


def _vae_model_and_state(cfg):
    model = setup_model(cfg.model_name, cross_modal=False,
                        latent_size=cfg.latent_size, architecture="cnn")
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    variables = model.init({"params": ks[0], "dropout": ks[1], "reparam": ks[2]},
                           jnp.zeros((2, 64, 64, 3)))
    tx = make_optimizer(cfg)
    return model, tx, create_train_state(variables["params"], tx)


def test_select_compute_dtype_auto(monkeypatch):
    """'auto' picks by model rows/step: bfloat16 below the measured ~512-row
    crossover, bfloat16_full at/above; non-TPU backends stay float32."""
    from mmdyn_tpu.problems.base import select_compute_dtype

    def mk(**kw):
        return ProblemConfig(model_name="cnn-mvae", input_type="visuotactile",
                             compute_dtype="auto", **kw)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # seq_modeling strides to one row per sequence
    assert select_compute_dtype(mk(batchsize=128), 8) == "bfloat16"
    assert select_compute_dtype(mk(batchsize=512), 8) == "bfloat16_full"
    # dyn_modeling runs every frame: rows = B*T
    assert select_compute_dtype(
        mk(batchsize=128, problem_type="dyn_modeling"), 8) == "bfloat16_full"
    # explicit policies pass through untouched
    assert select_compute_dtype(
        ProblemConfig(compute_dtype="float32", batchsize=4096), 8) == "float32"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert select_compute_dtype(mk(batchsize=4096), 8) == "float32"


class TestSteps:
    def test_train_step_decreases_loss(self):
        cfg = _small_cfg()
        model, tx, state = _vae_model_and_state(cfg)
        step = make_train_step(cfg, model, tx)
        batch = _batch()
        losses = []
        key = jax.random.PRNGKey(1)
        for i in range(4):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub, jnp.float32(0.5))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 4

    def test_eval_step_runs_without_grads(self):
        cfg = _small_cfg()
        model, tx, state = _vae_model_and_state(cfg)
        estep = make_eval_step(cfg, model)
        metrics, aux = estep(state.params, _batch(), jax.random.PRNGKey(0),
                             jnp.float32(1.0))
        assert np.isfinite(float(metrics["loss"]))
        assert aux["recon_x"].shape == (4, 64, 64, 3)

    def test_bf16_full_tracks_f32(self):
        """bfloat16_full activation policy: loss finite, decreasing, and
        within 1% of the f32 trajectory after a few steps (stats/latent/loss
        math stays f32 — models/layers.py::_uncast)."""
        finals = {}
        for dt in ("float32", "bfloat16_full"):
            cfg = _small_cfg(compute_dtype=dt)
            model = setup_model(cfg.model_name, cross_modal=False,
                                latent_size=cfg.latent_size,
                                architecture="cnn", compute_dtype=dt)
            ks = jax.random.split(jax.random.PRNGKey(0), 3)
            variables = model.init(
                {"params": ks[0], "dropout": ks[1], "reparam": ks[2]},
                jnp.zeros((2, 64, 64, 3)))
            tx = make_optimizer(cfg)
            state = create_train_state(variables["params"], tx)
            step = make_train_step(cfg, model, tx)
            batch = _batch()
            losses = []
            for i in range(4):
                state, m = step(state, batch, jax.random.PRNGKey(i),
                                jnp.float32(0.5))
                losses.append(float(m["loss"]))
            assert all(np.isfinite(l) for l in losses)
            assert losses[-1] < losses[0]
            finals[dt] = losses[-1]
        rel = abs(finals["bfloat16_full"] - finals["float32"]) / finals["float32"]
        assert rel < 0.01

    def test_kl_weight_traced_no_recompile(self):
        cfg = _small_cfg()
        model, tx, state = _vae_model_and_state(cfg)
        step = make_train_step(cfg, model, tx)
        batch = _batch()
        state, _ = step(state, batch, jax.random.PRNGKey(0), jnp.float32(0.1))
        before = step._cache_size()
        state, _ = step(state, batch, jax.random.PRNGKey(1), jnp.float32(0.9))
        assert step._cache_size() == before


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        cfg = _small_cfg()
        model, tx, state = _vae_model_and_state(cfg)
        step = make_train_step(cfg, model, tx)
        state, _ = step(state, _batch(), jax.random.PRNGKey(0), jnp.float32(1.0))
        save_checkpoint(tmp_path, state, epoch=3, best_loss=12.5)
        save_checkpoint(tmp_path, state, epoch=3, best_loss=12.5, name="latest")

        assert latest_checkpoint(tmp_path).name == "latest"
        _, _, fresh = _vae_model_and_state(cfg)
        restored, epoch, best, key, batch = restore_checkpoint(
            tmp_path / "latest", fresh)
        assert epoch == 3 and best == 12.5
        assert key is None and batch == 0   # no key was saved
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]))

    def test_preemption_fields_roundtrip(self, tmp_path):
        """key + batch_in_epoch (the preemption snapshot fields) persist."""
        cfg = _small_cfg()
        _, _, state = _vae_model_and_state(cfg)
        k = jax.random.PRNGKey(42)
        save_checkpoint(tmp_path, state, epoch=1, best_loss=2.0,
                        name="latest", key=k, batch_in_epoch=3)
        _, _, fresh = _vae_model_and_state(cfg)
        _, epoch, _, key, batch = restore_checkpoint(tmp_path / "latest", fresh)
        assert epoch == 1 and batch == 3
        np.testing.assert_array_equal(np.asarray(key), np.asarray(k))


class TestMultiDevice:
    def test_dp_train_step_on_8_device_mesh(self):
        """Sharded batch + replicated params: XLA inserts the grad psum."""
        assert len(jax.devices()) >= 8
        mesh = make_mesh(8)
        cfg = _small_cfg(batchsize=8)
        model, tx, state = _vae_model_and_state(cfg)
        state = replicate(mesh, state)
        batch = shard_batch(mesh, _batch(B=8))
        step = make_train_step(cfg, model, tx)
        state, metrics = step(state, batch, jax.random.PRNGKey(0),
                              jnp.float32(1.0))
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    @pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (2, 2, 2)])
    def test_dp_on_multi_axis_mesh_matches_1d(self, mesh_shape):
        """The mesh abstraction isn't hardcoded 1-D: a (2,4)/(4,2)/(2,2,2)
        device layout (multi-host DP shape: outer axis = DCN, inner = ICI)
        gives the identical loss as the flat 8-device mesh."""
        cfg = _small_cfg(batchsize=8)
        model, tx, state = _vae_model_and_state(cfg)
        estep = make_eval_step(cfg, model)
        batch = _batch(B=8)

        mesh_1d = make_mesh(8)
        m1, _ = estep(replicate(mesh_1d, state).params,
                      shard_batch(mesh_1d, batch), jax.random.PRNGKey(0),
                      jnp.float32(1.0))

        mesh_nd = make_mesh(mesh_shape=mesh_shape)
        assert mesh_nd.devices.shape == mesh_shape
        m2, _ = estep(replicate(mesh_nd, state).params,
                      shard_batch(mesh_nd, batch), jax.random.PRNGKey(0),
                      jnp.float32(1.0))
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)

    def test_dp_with_bf16_full_policy(self):
        """The bfloat16_full activation policy composes with the DP mesh:
        sharded step runs, loss finite, params stay replicated."""
        mesh = make_mesh(8)
        cfg = _small_cfg(batchsize=8, compute_dtype="bfloat16_full")
        model = setup_model(cfg.model_name, cross_modal=False,
                            latent_size=cfg.latent_size, architecture="cnn",
                            compute_dtype="bfloat16_full")
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        variables = model.init(
            {"params": ks[0], "dropout": ks[1], "reparam": ks[2]},
            jnp.zeros((2, 64, 64, 3)))
        tx = make_optimizer(cfg)
        state = replicate(mesh, create_train_state(variables["params"], tx))
        step = make_train_step(cfg, model, tx)
        state, metrics = step(state, shard_batch(mesh, _batch(B=8)),
                              jax.random.PRNGKey(0), jnp.float32(1.0))
        assert np.isfinite(float(metrics["loss"]))
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_dp_matches_single_device(self):
        """Same batch, same rng: DP-sharded loss == single-device loss."""
        mesh = make_mesh(8)
        cfg = _small_cfg(batchsize=8)
        model, tx, state = _vae_model_and_state(cfg)
        estep = make_eval_step(cfg, model)
        batch = _batch(B=8)
        m1, _ = estep(state.params, batch, jax.random.PRNGKey(0), jnp.float32(1.0))
        state_r = replicate(mesh, state)
        batch_s = shard_batch(mesh, batch)
        m2, _ = estep(state_r.params, batch_s, jax.random.PRNGKey(0),
                      jnp.float32(1.0))
        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)


class TestLoopEndToEnd:
    @pytest.mark.parametrize("model_name,input_type,use_pose", [
        ("cnn-vae", "visual", False),
        ("mlp-vae", "visual", False),
        ("cnn-mvae", "visuotactile", True),
    ])
    def test_problem_trains_and_checkpoints(self, tmp_path, model_name,
                                            input_type, use_pose):
        make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                             n_sequences=10, seq_length=3)
        cfg = ProblemConfig(problem_type="seq_modeling", model_name=model_name,
                            input_type=input_type, use_pose=use_pose,
                            latent_size=8, batchsize=4, num_epochs=2,
                            annealing_epochs=2)
        problem = Problem(cfg, tmp_path / "ds", logs_root=str(tmp_path / "logs"),
                          tensorboard=False)
        results = problem.train()
        assert len(results["Loss/train_epoch"]) == 2
        assert (problem.log_dir / "results.pkl").exists()
        assert latest_checkpoint(problem.checkpoint_dir) is not None
        assert (problem.log_dir / "tensorboard" / "metrics.jsonl").exists()
        # run is self-describing for dataset-free serving
        import json
        with open(problem.log_dir / "norms.json") as f:
            norms = json.load(f)
        assert norms["pose_min"] == [0.0] * 7
        assert norms["seq_length"] == 3
        # architecture facts serving needs are recorded at train time
        assert "condition_dim" in norms
        assert norms["compute_dtype"] == "float32"

    def test_reconstruction_problem_loop(self, tmp_path):
        """Plain autoencoding (problems.py:362-626 Reconstruction): every
        frame is its own target, loss decreases over 2 epochs."""
        make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                             n_sequences=10, seq_length=3)
        cfg = ProblemConfig(problem_type="reconstruction",
                            model_name="cnn-vae", input_type="visual",
                            latent_size=8, batchsize=4, num_epochs=2,
                            annealing_epochs=2)
        problem = Problem(cfg, tmp_path / "ds",
                          logs_root=str(tmp_path / "logs"), tensorboard=False)
        results = problem.train()
        losses = results["Loss/train_epoch"]
        assert len(losses) == 2 and all(np.isfinite(losses))
        assert latest_checkpoint(problem.checkpoint_dir) is not None

    def test_vis_pose_logs_triad_figures(self, tmp_path):
        """--vis-pose writes 3-D pose-triad figures (problems.py:605-614)."""
        # 21 sequences -> train 16 / test 4, so the 4-sequence eval batch
        # exists and the pose-figure branch actually runs
        make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                             n_sequences=21, seq_length=3)
        cfg = ProblemConfig(problem_type="seq_modeling",
                            model_name="cnn-mvae", input_type="visuotactile",
                            use_pose=True, latent_size=8, batchsize=4,
                            num_epochs=1, annealing_epochs=1)
        problem = Problem(cfg, tmp_path / "ds",
                          logs_root=str(tmp_path / "logs"), tensorboard=True,
                          vis_pose=True)
        logged = []
        orig = problem.writer.figure
        problem.writer.figure = lambda tag, fig, step: (
            logged.append(tag), orig(tag, fig, step))
        problem.train()
        assert "Pose_validation/input" in logged
        assert "Pose_validation/output_vs_target" in logged

    def test_resume_continues_from_epoch(self, tmp_path):
        make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                             n_sequences=10, seq_length=3)
        cfg = ProblemConfig(problem_type="seq_modeling", model_name="cnn-vae",
                            input_type="visual", latent_size=8, batchsize=4,
                            num_epochs=1, annealing_epochs=2)
        p1 = Problem(cfg, tmp_path / "ds", logs_root=str(tmp_path / "logs"),
                     tensorboard=False)
        p1.train()
        cfg2 = ProblemConfig(problem_type="seq_modeling", model_name="cnn-vae",
                             input_type="visual", latent_size=8, batchsize=4,
                             num_epochs=2, annealing_epochs=2)
        p2 = Problem(cfg2, tmp_path / "ds", log_dir=str(p1.log_dir),
                     tensorboard=False, resume=True)
        assert p2._start_epoch == 1
        p2.train()

    def test_loader_shuffle_is_restart_stable(self, tmp_path):
        """Pass e's order is a pure function of (seed, e): a reconstructed
        loader pinned to epoch e replays the same batches (the preemption-
        resume contract)."""
        from mmdyn_tpu.data.loader import BatchLoader
        rng = np.random.default_rng(0)
        arrays = {"x": rng.normal(size=(12, 3)).astype(np.float32)}
        a = BatchLoader(arrays, 4, shuffle=True, seed=7)
        e0 = [b["x"] for b in a]
        e1 = [b["x"] for b in a]
        assert not all(np.array_equal(x, y) for x, y in zip(e0, e1))
        ld2 = BatchLoader(arrays, 4, shuffle=True, seed=7)
        ld2.set_epoch(1)
        e1_replay = [b["x"] for b in ld2]
        for x, y in zip(e1, e1_replay):
            np.testing.assert_array_equal(x, y)

    def test_dyn_modeling_and_regression(self, tmp_path):
        make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                             n_sequences=8, seq_length=3)
        for ptype, mname, itype in (("dyn_modeling", "cnn-vae", "tactile"),
                                    ("regression", "regressor", "visual")):
            cfg = ProblemConfig(problem_type=ptype, model_name=mname,
                                input_type=itype, latent_size=8, batchsize=2,
                                num_epochs=1, annealing_epochs=1)
            problem = Problem(cfg, tmp_path / "ds",
                              logs_root=str(tmp_path / f"logs_{ptype}"),
                              tensorboard=False)
            results = problem.train()
            assert np.isfinite(results["Loss/train_epoch"][0])


class TestPreemption:
    """Kill a real training process mid-epoch with SIGTERM; --resume must
    complete bit-identically to an uninterrupted golden run (the loader
    shuffle is restart-stable and checkpoints carry the PRNG key stream +
    epoch/step position — train/loop.py preemption path)."""

    def _drive(self, ds, log_dir, extra=()):
        import json
        import os
        import subprocess
        import sys
        from pathlib import Path
        driver = Path(__file__).parent / "_preempt_driver.py"
        env = dict(os.environ)
        env["PYTHONPATH"] = os.pathsep.join(
            [str(Path(__file__).parents[1])]
            + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
        proc = subprocess.run(
            [sys.executable, str(driver), "--dataset", str(ds),
             "--log-dir", str(log_dir), "--epochs", "3", "--seed", "0",
             *extra],
            capture_output=True, text=True, timeout=900, env=env)
        assert proc.returncode == 0, proc.stderr + proc.stdout
        return json.loads(proc.stdout.strip().splitlines()[-1])

    def _latest_params(self, log_dir):
        import orbax.checkpoint as ocp
        from pathlib import Path
        path = (Path(log_dir) / "checkpoint" / "latest").absolute()
        ckptr = ocp.PyTreeCheckpointer()
        meta = ckptr.metadata(path).item_metadata
        tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return ckptr.restore(path, restore_args=restore_args)["state"]["params"]

    def test_sigterm_kill_resume_matches_uninterrupted(self, tmp_path):
        make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                             n_sequences=10, seq_length=2)
        golden = self._drive(tmp_path / "ds", tmp_path / "golden")
        assert golden["preempted"] is False and len(golden["val"]) == 3

        # SIGTERM lands after optimizer step 3 = mid-epoch 1 (2 batches/epoch)
        killed = self._drive(tmp_path / "ds", tmp_path / "pre",
                             extra=("--kill-after-steps", "3"))
        assert killed["preempted"] is True
        assert len(killed["val"]) < 3
        assert (tmp_path / "pre" / "checkpoint" / "latest").exists()

        resumed = self._drive(tmp_path / "ds", tmp_path / "pre",
                              extra=("--resume",))
        # the resumed run replays the interrupted epoch's remaining steps and
        # finishes; validation losses match the golden run's exactly
        n = len(resumed["val"])
        assert n >= 2
        np.testing.assert_allclose(resumed["val"], golden["val"][-n:],
                                   rtol=1e-6)
        # and the final parameters are bit-identical
        gp = self._latest_params(tmp_path / "golden")
        rp = self._latest_params(tmp_path / "pre")
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(rp)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_empty_train_split_fails_loudly(tmp_path):
    """Batch larger than the train split means zero optimizer steps — that
    must be a hard error, not a silently-zero loss curve."""
    make_synthetic_dumps(tmp_path / "ds", n_sequences=5, seq_length=4)
    cfg = _small_cfg(batchsize=64)
    with pytest.raises(ValueError, match="train split"):
        Problem(cfg, str(tmp_path / "ds"), save_name="too_big",
                logs_root=str(tmp_path / "logs"), tensorboard=False)


def test_cli_end_to_end(tmp_path):
    """Full CLI smoke: synthetic dumps -> compile -> 1 training epoch."""
    make_synthetic_dumps(tmp_path / "ds", n_sequences=5, seq_length=4)
    from mmdyn_tpu.cli.main import main
    problem = main([
        "--problem-type", "seq_modeling", "--model-name", "cnn-vae",
        "--input-type", "visual", "--dataset-path", str(tmp_path / "ds"),
        "--batchsize", "2", "--num-epochs", "1", "--latent-size", "8",
        "--logs-root", str(tmp_path / "logs"), "--no-tensorboard",
        "--save-name", "smoke",
    ])
    assert (problem.log_dir / "problem.pkl").exists()
    assert (problem.log_dir / "results.pkl").exists()


class TestConditionalAndMask:
    def test_conditional_cvae_with_shock(self, tmp_path):
        """exp_3-style pathway: shock condition -> conditional MVAE."""
        make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                             n_sequences=10, seq_length=3, with_shock=True)
        cfg = ProblemConfig(problem_type="seq_modeling", model_name="cnn-mvae",
                            input_type="visuotactile", use_pose=True,
                            conditional=True, latent_size=8, batchsize=4,
                            num_epochs=1, annealing_epochs=1)
        problem = Problem(cfg, tmp_path / "ds",
                          logs_root=str(tmp_path / "logs"), tensorboard=False)
        assert problem.cfg.condition_dim == 1  # shock width
        results = problem.train()
        assert np.isfinite(results["Loss/train_epoch"][0])

    def test_mask_loss_path(self, tmp_path):
        make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                             n_sequences=10, seq_length=3)
        cfg = ProblemConfig(problem_type="seq_modeling", model_name="cnn-vae",
                            input_type="visual", mask_loss=True,
                            latent_size=8, batchsize=4, num_epochs=1,
                            annealing_epochs=1)
        problem = Problem(cfg, tmp_path / "ds",
                          logs_root=str(tmp_path / "logs"), tensorboard=False)
        results = problem.train()
        assert np.isfinite(results["Loss/train_epoch"][0])


def test_problem_loop_with_mesh(tmp_path):
    """Full Problem epoch loop under an 8-device data-parallel mesh."""
    make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                         n_sequences=24, seq_length=2)
    cfg = ProblemConfig(problem_type="seq_modeling", model_name="cnn-vae",
                        input_type="visual", latent_size=8, batchsize=8,
                        num_epochs=1, annealing_epochs=1)
    mesh = make_mesh(8)
    problem = Problem(cfg, tmp_path / "ds", logs_root=str(tmp_path / "logs"),
                      tensorboard=False, mesh=mesh)
    results = problem.train()
    assert np.isfinite(results["Loss/train_epoch"][0])
    leaf = jax.tree_util.tree_leaves(problem.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_evaluate_cli_end_to_end(tmp_path):
    """Train via the CLI, then evaluate the run with the evaluation CLI."""
    make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                         n_sequences=16, seq_length=2)
    from mmdyn_tpu.cli.main import main as train_main
    problem = train_main([
        "--problem-type", "seq_modeling", "--model-name", "cnn-vae",
        "--input-type", "visual", "--dataset-path", str(tmp_path / "ds"),
        "--batchsize", "2", "--num-epochs", "1", "--latent-size", "8",
        "--logs-root", str(tmp_path / "logs"), "--no-tensorboard",
    ])
    from mmdyn_tpu.cli.evaluate import main as eval_main
    metrics = eval_main(["--run", str(problem.log_dir),
                         "--dataset-path", str(tmp_path / "ds"),
                         "--batchsize", "2", "--n-samples", "4"])
    assert np.isfinite(metrics["test_loss_total"])
    plot = problem.log_dir / "plot"
    assert (plot / "eval_metrics.json").exists()
    assert (plot / "recon.png").exists()
    assert any(p.name.startswith("samples_") for p in plot.iterdir())


def test_evaluate_cli_conditional_run(tmp_path):
    """Evaluate a --conditional (CVAE) run: the prior-sample batch must match
    --n-samples (regression: the sampler was fixed at the training n=50 while
    the condition used --n-samples, crashing the concat)."""
    make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                         n_sequences=12, seq_length=2, with_shock=True)
    from mmdyn_tpu.cli.main import main as train_main
    problem = train_main([
        "--problem-type", "seq_modeling", "--model-name", "cnn-vae",
        "--input-type", "visual", "--conditional",
        "--dataset-path", str(tmp_path / "ds"),
        "--batchsize", "2", "--num-epochs", "1", "--latent-size", "8",
        "--logs-root", str(tmp_path / "logs"), "--no-tensorboard",
    ])
    from mmdyn_tpu.cli.evaluate import main as eval_main
    metrics = eval_main(["--run", str(problem.log_dir),
                         "--dataset-path", str(tmp_path / "ds"),
                         "--batchsize", "2", "--n-samples", "3"])
    assert np.isfinite(metrics["test_loss_total"])
    samples = [p for p in (problem.log_dir / "plot").iterdir()
               if p.name.startswith("samples_")]
    assert samples


def test_dyn_modeling_mvae_loop(tmp_path):
    """dyn_modeling with the full MVAE+pose model through the Problem loop."""
    make_compiled_arrays(tmp_path / "ds" / "compiled_dataset_v2.npz",
                         n_sequences=8, seq_length=2)
    cfg = ProblemConfig(problem_type="dyn_modeling", model_name="cnn-mvae",
                        input_type="visuotactile", use_pose=True,
                        latent_size=8, batchsize=2, num_epochs=1,
                        annealing_epochs=1)
    problem = Problem(cfg, tmp_path / "ds", logs_root=str(tmp_path / "logs"),
                      tensorboard=False)
    results = problem.train()
    assert np.isfinite(results["Loss/train_epoch"][0])


class TestMultiHostLoader:
    """Multi-process input correctness (single-process simulation): the
    per-host row-block convention of BatchLoader must match the device order
    NamedSharding assigns, so jax.make_array_from_process_local_data on each
    host yields the same global array a single host would build."""

    def _arrays(self, n=16):
        rng = np.random.default_rng(0)
        return {"visual": rng.integers(0, 255, (n, 2, 4, 4, 3),
                                       dtype=np.uint8),
                "final_pose": rng.uniform(size=(n, 7)).astype(np.float32)}

    def test_process_loaders_partition_the_global_batch(self):
        from mmdyn_tpu.data.loader import BatchLoader

        arrays = self._arrays()
        whole = list(BatchLoader(arrays, 8, shuffle=True, seed=3))
        parts = [list(BatchLoader(arrays, 8, shuffle=True, seed=3,
                                  process_index=p, process_count=4))
                 for p in range(4)]
        assert len(whole) == len(parts[0]) == 2   # len() counts GLOBAL batches
        for b in range(len(whole)):
            for k in arrays:
                glued = np.concatenate([parts[p][b][k] for p in range(4)])
                np.testing.assert_array_equal(glued, whole[b][k])

    def test_shard_contents_match_row_block_convention(self):
        """Each device's shard of a batch-sharded global array must hold the
        contiguous row block the loader convention assigns it, in mesh device
        order — the invariant make_array_from_process_local_data relies on."""
        from mmdyn_tpu.data.loader import to_device_batch
        from mmdyn_tpu.parallel.mesh import batch_sharding, make_mesh

        mesh = make_mesh(8)
        sharding = batch_sharding(mesh)
        batch = self._arrays(n=8)
        dev = to_device_batch(batch, sharding=sharding)
        want_visual = batch["visual"].astype(np.float32) / 255.0
        for key, want in (("visual", want_visual),
                          ("final_pose", batch["final_pose"])):
            arr = dev[key]
            by_device = {s.device: s for s in arr.addressable_shards}
            for d, device in enumerate(mesh.devices.ravel()):
                shard = by_device[device]
                np.testing.assert_allclose(np.asarray(shard.data),
                                           want[d:d + 1], rtol=1e-6)

    def test_process_batch_must_divide(self):
        from mmdyn_tpu.data.loader import BatchLoader

        with pytest.raises(ValueError, match="divide evenly"):
            BatchLoader(self._arrays(), 6, process_index=0, process_count=4)
