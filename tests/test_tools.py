"""Guards for the driver-contract tooling: bench.py's measurement core and
the run-curve plotter. These run tiny CPU configurations — the point is that
the entry points keep working, not the numbers."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


class TestBenchCore:
    def test_bench_train_runs_tiny(self):
        from bench import bench_train
        fps, step_time, loss = bench_train(batch=2, steps=1, latent=8,
                                           dtype="float32", seq_len=2)
        assert fps > 0 and step_time > 0
        assert np.isfinite(loss)

    def test_bench_train_bf16_full_policy(self):
        from bench import bench_train
        fps, _, loss = bench_train(batch=2, steps=1, latent=8,
                                   dtype="bfloat16_full", seq_len=2)
        assert fps > 0 and np.isfinite(loss)

    def test_bench_gen_probe_runs_tiny(self):
        from bench import bench_gen
        fps, dt = bench_gen(trials=2, steps=20, interval=10)
        assert fps > 0 and dt > 0


class TestPlotRun:
    def test_plot_run_renders_curves(self, tmp_path):
        run = tmp_path / "run" / "tensorboard"
        run.mkdir(parents=True)
        with open(run / "metrics.jsonl", "w") as f:
            for e in range(5):
                f.write(json.dumps({"tag": "Loss/train_epoch",
                                    "value": 100.0 - e, "step": e}) + "\n")
                f.write(json.dumps({"tag": "Loss/validation_epoch",
                                    "value": 0.0, "step": e}) + "\n")
        out = tmp_path / "curve.png"
        proc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "plot_run.py"),
             "--run", str(tmp_path / "run"), "--out", str(out)],
            capture_output=True, text=True, cwd=REPO)
        assert proc.returncode == 0, proc.stderr
        assert out.exists() and out.stat().st_size > 0
        summary = json.loads((tmp_path / "curve.json").read_text())
        assert summary["epochs"] == 5
        assert summary["train_last"] == 96.0


class TestMultiHostSmoke:
    """End-to-end multi-process input path: 2 real OS processes under
    jax.distributed (localhost coordinator, gloo CPU collectives) must
    reproduce the single-process golden loss trajectory through the
    production BatchLoader/to_device_batch sharding plumbing."""

    def test_two_process_trajectory_matches_golden(self):
        proc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "multihost_smoke.py"),
             "--spawn", "2"],
            capture_output=True, text=True, cwd=REPO, timeout=420)
        assert proc.returncode == 0, proc.stderr + proc.stdout
        report = json.loads(proc.stdout.strip().splitlines()[-1])
        assert report["ok"] is True
        assert report["process_0_max_rel_gap"] < 1e-5
        assert report["process_1_max_rel_gap"] < 1e-5


class TestBulletDiff:
    """The cross-engine diff harness must itself be known-good: identical
    runs diff to zero, perturbed runs are detected, and the report survives
    the fake-Bullet engine pair."""

    def _run(self, argv):
        from tools import bullet_diff
        import io, contextlib
        buf = io.StringIO()
        code = 0
        with contextlib.redirect_stdout(buf):
            try:
                bullet_diff.main(argv)
            except SystemExit as e:
                code = int(e.code or 0)
        # the in-process CLI runs print progress lines; the report is last
        return json.loads(buf.getvalue().strip().splitlines()[-1]), code

    def test_same_engine_same_seed_is_identical(self, tmp_path):
        report, code = self._run([
            "--script", "demo", "--engines", "analytic,analytic",
            "--seed", "3", "--n_timesteps", "60", "--interval", "20",
            "--workdir", str(tmp_path)])
        assert code == 0 and report["ok"]
        seq = report["sequences"][0]
        assert seq["pos_l2_max"] == 0.0
        # acos rounding on a unit dot product leaves ~1e-4 deg of noise
        assert seq["orn_deg_final"] < 0.01
        assert seq["visual_mad_max"] == 0.0
        assert seq["tactile_mad_max"] == 0.0
        assert seq["seg_coverage_a"] == seq["seg_coverage_b"]

    def test_detects_divergence(self, tmp_path):
        """Different objects fall differently -> nonzero pose and image
        diffs, and a tight tolerance trips the failure path. (The demo drop
        itself is deterministic, so divergence comes from the scene.)"""
        from mmdyn_tpu.cli import demo
        a, b = tmp_path / "a", tmp_path / "b"
        common = ["--headless", "--engine", "analytic", "--n_timesteps",
                  "60", "--interval", "20", "--seed", "3"]
        demo.main(common + ["--object", "winebottle", "--logdir", str(a)])
        demo.main(common + ["--object", "bowl", "--logdir", str(b)])
        report, code = self._run([
            "--skip-run", "--engines", "a,b", "--workdir", str(tmp_path),
            "--tol-pos-final", "1e-6", "--tol-img-mad", "1e-6"])
        assert code == 1 and not report["ok"]
        assert report["sequences"][0]["pos_l2_final"] > 0
        assert report["failures"]

    def test_fake_bullet_vs_analytic(self, tmp_path, monkeypatch):
        """The pybullet,analytic pair runs end-to-end against the functional
        fake — the exact invocation to use on a real-Bullet machine."""
        import tests.fake_pybullet as fake_pybullet
        monkeypatch.chdir(REPO)
        fake_pybullet.install()
        try:
            report, code = self._run([
                "--script", "demo", "--engines", "pybullet,analytic",
                "--seed", "3", "--n_timesteps", "60", "--interval", "20",
                "--workdir", str(tmp_path),
                "--extra=--fast-shading,--object,bowl"])
        finally:
            fake_pybullet.uninstall()
        seq = report["sequences"][0]
        assert seq["frames"] == 3
        # both engines must at least agree the object is in view
        assert seq["seg_coverage_a"] > 0 and seq["seg_coverage_b"] > 0


class TestRerenderDataset:
    def test_rerender_matches_generated_tactile(self, tmp_path):
        """Re-rendering from the dumped (uint8-quantised) depth PNGs must
        reproduce the generation-time tactile stream closely — same pipeline,
        only the depth quantisation differs."""
        import cv2

        from mmdyn_tpu.cli import demo

        demo.main(["--headless", "--engine", "analytic", "--object", "bowl",
                   "--n_timesteps", "60", "--interval", "20", "--seed", "3",
                   "--logdir", str(tmp_path)])
        proc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "rerender_dataset.py"),
             "--dataset", str(tmp_path), "--suffix", "_re",
             "--thickness", "0.01",    # demo sensor thickness (demo.py)
             "--platform", "cpu"],
            capture_output=True, text=True, cwd=REPO)
        assert proc.returncode == 0, proc.stderr
        stats = json.loads(proc.stdout.strip().splitlines()[-1])
        assert stats["frames"] == 3
        # the suffix is normalised to '-re' so outputs never match the
        # dataset compiler's tactile_*.png glob
        assert not list((tmp_path / "dataset").glob("tactile_re_*.png"))
        for i in range(3):
            a = cv2.imread(str(tmp_path / "dataset" / f"tactile_{i:04d}.png"))
            b = cv2.imread(str(tmp_path / "dataset" / f"tactile-re_{i:04d}.png"))
            diff = np.abs(a.astype(int) - b.astype(int))
            # uint8 depth quantisation moves a few counts; gross agreement
            assert np.mean(diff) < 6.0, np.mean(diff)


class TestCompileCache:
    def test_respects_opt_out(self, monkeypatch):
        from mmdyn_tpu.utils import compile_cache
        monkeypatch.setenv("MMDYN_COMPILE_CACHE", "off")
        assert compile_cache.maybe_enable() is None

    def test_env_dir_and_explicit_dir(self, tmp_path, monkeypatch):
        import jax
        from mmdyn_tpu.utils import compile_cache
        monkeypatch.setenv("MMDYN_COMPILE_CACHE", str(tmp_path / "envdir"))
        assert compile_cache.maybe_enable() == str(tmp_path / "envdir")
        # explicit argument wins over the env var (the test-suite conftest)
        assert (compile_cache.maybe_enable(str(tmp_path / "arg"))
                == str(tmp_path / "arg"))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "arg")
        # restore the suite's cache dir for subsequent tests
        compile_cache.maybe_enable("/tmp/mmdyn_xla_cache_tests")


class TestRolloutEval:
    def _fake_run(self, tmp_path, problem_type="dyn_modeling"):
        import pickle

        import jax
        import jax.numpy as jnp

        from mmdyn_tpu.models.factory import setup_model
        from mmdyn_tpu.problems.base import ProblemConfig, make_optimizer
        from mmdyn_tpu.train.checkpoint import save_checkpoint
        from mmdyn_tpu.train.state import create_train_state

        cfg = ProblemConfig(problem_type=problem_type, model_name="cnn-vae",
                            input_type="visual", latent_size=8, batchsize=2)
        model = setup_model("cnn-vae", cross_modal=False, latent_size=8,
                            architecture="cnn", conditional=False,
                            categorical_conditions=False, condition_dim=None,
                            input_dim=64 * 64, compute_dtype="float32")
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "reparam": jax.random.PRNGKey(2)}
        params = model.init(rngs, jnp.zeros((2, 64, 64, 3)), None)["params"]
        state = create_train_state(params, make_optimizer(cfg))
        run = tmp_path / "run_dyn"
        (run / "checkpoint").mkdir(parents=True)
        with open(run / "problem.pkl", "wb") as f:
            pickle.dump({"problem_type": problem_type,
                         "model_name": "cnn-vae", "input_type": "visual",
                         "latent_size": 8, "batchsize": 2,
                         "dataset_path": "unused"}, f)
        save_checkpoint(run / "checkpoint", state, 0, 1.0, name="latest")
        return run

    def test_scores_rollout_against_dump(self, tmp_path):
        from mmdyn_tpu.data.synthetic import make_synthetic_dumps
        from tools.rollout_eval import main

        make_synthetic_dumps(tmp_path / "ds", n_sequences=1, seq_length=5)
        seq = next((tmp_path / "ds").glob("**/visual_0000.png")).parent
        run = self._fake_run(tmp_path)
        report = main(["--run", str(run), "--frames", str(seq),
                       "--out", str(tmp_path / "r.json"),
                       "--strip", str(tmp_path / "strip.png")])
        assert report["horizon"] == 4
        vis = report["visual"]
        assert len(vis["rollout_l1"]) == 4
        assert len(vis["teacher_l1"]) == 4
        assert len(vis["persistence_l1"]) == 4
        assert all(np.isfinite(x) for x in vis["rollout_bce"])
        assert (tmp_path / "strip.png").exists()
        assert json.loads((tmp_path / "r.json").read_text())["horizon"] == 4


class TestCounterfactual:
    def test_sweep_moves_predictions(self, tmp_path):
        import pickle

        import jax
        import jax.numpy as jnp

        from mmdyn_tpu.data.synthetic import make_synthetic_dumps
        from mmdyn_tpu.models.factory import setup_model
        from mmdyn_tpu.problems.base import ProblemConfig, make_optimizer
        from mmdyn_tpu.train.checkpoint import save_checkpoint
        from mmdyn_tpu.train.state import create_train_state
        from tools.counterfactual import main

        cfg = ProblemConfig(problem_type="seq_modeling",
                            model_name="cnn-mvae",
                            input_type="visuotactile", conditional=True,
                            condition_dim=2, latent_size=8, batchsize=2)
        model = setup_model("cnn-mvae", cross_modal=True, latent_size=8,
                            use_pose=False, architecture="cnn",
                            conditional=True, categorical_conditions=False,
                            condition_dim=2, compute_dtype="float32")
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "reparam": jax.random.PRNGKey(2)}
        img = jnp.zeros((2, 64, 64, 3))
        params = model.init(rngs, [img, img], None,
                            jnp.zeros((2, 2)))["params"]
        state = create_train_state(params, make_optimizer(cfg))
        run = tmp_path / "run_cvae"
        (run / "checkpoint").mkdir(parents=True)
        with open(run / "problem.pkl", "wb") as f:
            pickle.dump({"problem_type": "seq_modeling",
                         "model_name": "cnn-mvae",
                         "input_type": "visuotactile", "conditional": True,
                         "latent_size": 8, "batchsize": 2,
                         "dataset_path": "unused"}, f)
        save_checkpoint(run / "checkpoint", state, 0, 1.0, name="latest")

        make_synthetic_dumps(tmp_path / "ds", n_sequences=1, seq_length=4)
        seq = next((tmp_path / "ds").glob("**/visual_0000.png")).parent
        report = main(["--run", str(run), "--frames", str(seq),
                       "--sweep", "0,1",
                       "--strip", str(tmp_path / "cf.png")])
        assert report["condition_dim"] == 2
        assert report["visual_l1_vs_base"][0] == 0.0      # base vs itself
        assert report["visual_l1_vs_base"][1] > 0.0       # condition is live
        assert report["mu_l2_vs_base"][1] > 0.0
        assert (tmp_path / "cf.png").exists()


class TestBenchHttp:
    def test_smoke_two_clients(self, capsys):
        import json as _json

        from tools.bench_http import main

        main(["--clients", "2", "--requests", "2", "--batchsize", "2",
              "--wait-ms", "50", "--calibrate-frames", "2"])
        lines = [l for l in capsys.readouterr().out.splitlines()
                 if l.startswith("{")]
        assert len(lines) == 2
        off, on = (_json.loads(l) for l in lines)
        assert off["requests"] == on["requests"] == 4
        assert on["coalescing"] >= off["coalescing"]
