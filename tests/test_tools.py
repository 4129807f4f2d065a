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
