"""Problem orchestration: run dirs, dataset/model/optimizer setup, epoch loop.

Mirrors the reference Problem lifecycle (mmdyn/pytorch/problems/problems.py:
23-216) with TPU-native internals: jitted fused steps, device-prefetched
batches, async metric accumulation (host sync once per epoch instead of the
reference's per-batch loss.item()), optional data-parallel mesh, and — new
capability — resume from checkpoint.
"""

from __future__ import annotations

import dataclasses
import pickle
from collections import defaultdict
from datetime import datetime
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from mmdyn_tpu.data.dataset import dataset_setup
from mmdyn_tpu.data.loader import device_prefetch, to_device_batch
from mmdyn_tpu.models.factory import count_parameters, setup_model
from mmdyn_tpu.parallel.mesh import batch_sharding, replicate
from mmdyn_tpu.problems.base import (ProblemConfig, anneal_kl, make_optimizer,
                                     select_compute_dtype)
from mmdyn_tpu.train.checkpoint import (latest_checkpoint, restore_checkpoint,
                                        save_checkpoint)
from mmdyn_tpu.train.metrics import MetricWriter
from mmdyn_tpu.train.profiler import StepTimer, trace
from mmdyn_tpu.train.state import create_train_state
from mmdyn_tpu.train.steps import make_eval_step, make_sample_fn, make_train_step


class Problem:
    """End-to-end training driver for one problem configuration."""

    def __init__(self, cfg: ProblemConfig, dataset_path, save_name="run",
                 logs_root="./logs", log_dir=None, seed=0, mesh=None,
                 tensorboard=True, strict_parity=True, resume=False,
                 profile_dir=None, image_interval=1, ckpt_interval=1,
                 vis_pose=False, no_crop=False):
        self.dataset_path = dataset_path
        self.mesh = mesh
        self.seed = seed
        self.profile_dir = profile_dir
        # the reference samples/logs images and checkpoints every epoch
        # (problems.py:199-206); intervals > 1 amortise that host-side
        # overhead on long runs (best-val checkpoints still save whenever the
        # validation loss improves, and the final epoch always logs + saves)
        self.image_interval = max(1, int(image_interval))
        self.ckpt_interval = max(1, int(ckpt_interval))
        self.vis_pose = vis_pose   # 3-D pose-triad figures (slow; main.py:35)
        self._step_timer = StepTimer()
        self._best_loss = np.inf
        self._start_epoch = 0
        self._skip_batches = 0          # preemption resume: replayed-epoch skip
        self._stop_requested = False    # set by the SIGTERM handler
        self._preempted = False         # set once the preemption snapshot saved
        self._logger_dict = defaultdict(list)

        if log_dir:
            self.log_dir = Path(log_dir)
        else:
            date = datetime.now().strftime("_%Y_%m_%d_%H_%M_%S")
            self.log_dir = Path(logs_root) / (save_name + date)
        self.checkpoint_dir = self.log_dir / "checkpoint"
        self.tensorboard_dir = self.log_dir / "tensorboard"
        self.plot_dir = self.log_dir / "plot"
        for d in (self.log_dir, self.checkpoint_dir, self.tensorboard_dir,
                  self.plot_dir):
            d.mkdir(parents=True, exist_ok=True)
        self.writer = MetricWriter(self.tensorboard_dir, tensorboard=tensorboard)

        # --- dataset ---
        dd = dataset_setup(dataset_path, cfg.problem_type,
                           batchsize=cfg.batchsize, shuffle=True, seed=seed,
                           strict_parity=strict_parity,
                           mask_loss=cfg.mask_loss, crop=not no_crop)
        self.train_dataset = dd["train_dataset"]
        self.test_dataset = dd["test_dataset"]
        self.train_loader = dd["train_loader"]
        self.test_loader = dd["test_loader"]
        self.seq_length = dd["seq_length"]
        print(f"dataset: {len(self.train_dataset)} train / "
              f"{len(self.test_dataset)} test sequences  "
              f"(seq_length {self.seq_length})")
        if len(self.train_loader) == 0 and cfg.num_epochs > 0:
            # evaluation-only reattachment (num_epochs=0, cli/evaluate.py)
            # never takes an optimizer step, so only a *training* run errors
            raise ValueError(
                f"train split ({len(self.train_dataset)} sequences) is "
                f"smaller than the batch size ({cfg.batchsize}) with "
                f"drop_last on — zero optimizer steps per epoch. Use a "
                f"smaller batch or more data. (Note: the strict-parity "
                f"compile drops the final globbed sequence, and the test "
                f"split drops its last element — datasets.py:210-224,107-108.)")
        if len(self.test_loader) == 0:
            msg = (f"test split ({len(self.test_dataset)} sequences) is "
                   f"smaller than the batch size ({cfg.batchsize}) and "
                   f"drop_last is on (reference semantics) — validation loss "
                   f"will read 0. Use a smaller batch or more data.")
            print(f"WARNING: {msg}")
            self.writer.text("warnings/empty_test_split", msg)

        # --- condition dim (the shock-force width, problems.py:675-681) ---
        condition_dim = self.train_dataset.shock_dim
        self.cfg = dataclasses.replace(
            cfg, condition_dim=condition_dim,
            # "auto" resolves once seq_length is known (rows per step differ
            # by problem family — see base.select_compute_dtype)
            compute_dtype=select_compute_dtype(cfg, self.seq_length))

        # make the run self-describing for dataset-free serving: record the
        # dataset's min-max normalisation constants (the reference computes
        # and discards them at compile, datasets.py:187-204) plus the
        # train-time architecture facts serving would otherwise have to
        # infer from parameter shapes (serve/session.py)
        norms = dict(getattr(self.train_dataset, "norms", {}) or {})
        import json
        norms["seq_length"] = self.seq_length
        norms["condition_dim"] = condition_dim
        norms["compute_dtype"] = self.cfg.compute_dtype
        # serving must preprocess raw frames the way this run's compile did
        # (cli/infer.py gates the seg-bbox re-crop on this)
        norms["crop"] = bool(getattr(self.train_dataset, "crop", True))
        with open(self.log_dir / "norms.json", "w") as f:
            json.dump(norms, f, indent=2)

        # --- model ---
        self.model = self._build_model()
        key = jax.random.PRNGKey(seed)
        self._key, init_key = jax.random.split(key)
        # prior-sampling keys come from a separate fold of the seed: skipping
        # _sample via --image-interval must not shift the training/eval key
        # stream (an interval>1 run stays bit-identical to interval=1)
        self._sample_key = jax.random.fold_in(jax.random.PRNGKey(seed), 1)
        params = self._init_params(init_key)
        print(f"model: {self.cfg.model_name}  "
              f"params: {count_parameters(params):,}")

        # --- optimizer / state / steps ---
        self.tx = make_optimizer(self.cfg)
        self.state = create_train_state(params, self.tx)
        if mesh is not None:
            self.state = replicate(mesh, self.state)
        self.train_step = make_train_step(self.cfg, self.model, self.tx)
        self.eval_step = make_eval_step(self.cfg, self.model)
        self.sample_fn = make_sample_fn(self.cfg, self.model, n=50)

        if resume:
            self._resume()

    # ------------------------------------------------------------------
    def _build_model(self):
        cfg = self.cfg
        if cfg.problem_type == "regression":
            return setup_model(cfg.model_name, out_dim=7,
                               conditional=cfg.conditional,
                               condition_dim=cfg.condition_dim,
                               compute_dtype=cfg.compute_dtype)
        kwargs = dict(
            latent_size=cfg.latent_size,
            architecture=cfg.model_name.split("-")[0],
            conditional=cfg.conditional,
            categorical_conditions=cfg.categorical_conditions,
            condition_dim=cfg.condition_dim,
            compute_dtype=cfg.compute_dtype,
        )
        if cfg.is_mvae:
            kwargs["use_pose"] = cfg.use_pose
        else:
            kwargs["input_dim"] = 64 * 64  # problems.py:372 np.prod(input_size)
        return setup_model(cfg.model_name, cross_modal=cfg.cross_modal, **kwargs)

    def _init_params(self, key):
        cfg = self.cfg
        ks = jax.random.split(key, 3)
        rngs = {"params": ks[0], "dropout": ks[1], "reparam": ks[2]}
        img = jnp.zeros((2, 64, 64, 3))
        cond = jnp.zeros((2, cfg.condition_dim)) if cfg.conditional else None
        if cfg.problem_type == "regression":
            variables = self.model.init(rngs, img, cond)
        elif cfg.is_mvae and cfg.cross_modal:
            pose = jnp.zeros((2, 7)) if cfg.use_pose else None
            variables = self.model.init(rngs, [img, img], pose, cond)
        else:
            variables = self.model.init(rngs, img, cond)
        return variables["params"]

    def _resume(self):
        path = latest_checkpoint(self.checkpoint_dir)
        if path is None:
            print("resume requested but no checkpoint found; starting fresh")
            return
        (self.state, epoch, self._best_loss, key,
         batch_in_epoch) = restore_checkpoint(path, self.state)
        if key is not None:
            # the train/eval key stream continues exactly where it stopped —
            # a resumed run is bit-identical to an uninterrupted one
            self._key = jnp.asarray(key, jnp.uint32)
        if batch_in_epoch > 0:
            # mid-epoch preemption snapshot: replay epoch `epoch`, skipping
            # its first `batch_in_epoch` optimizer steps (the loader's order
            # is a pure function of (seed, epoch), so the remaining batches
            # are the very ones the interrupted process never ran)
            self._start_epoch = epoch
            self._skip_batches = batch_in_epoch
            print(f"resumed from {path} mid-epoch {epoch} "
                  f"(skipping {batch_in_epoch} completed steps, "
                  f"best val loss {self._best_loss:.4f})")
        else:
            self._start_epoch = epoch + 1
            print(f"resumed from {path} at epoch {epoch} "
                  f"(best val loss {self._best_loss:.4f})")
        for loader in (self.train_loader, self.test_loader):
            if hasattr(loader, "set_epoch"):
                loader.set_epoch(self._start_epoch)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _prefetch(self, loader):
        sharding = batch_sharding(self.mesh) if self.mesh is not None else None
        return device_prefetch(iter(loader), size=2, sharding=sharding)

    # ------------------------------------------------------------------
    def _train_epoch(self, epoch, kl_weight):
        n_batches = len(self.train_loader)
        step_losses, perf_acc = [], defaultdict(list)
        # mid-epoch resume: replay the epoch's (restart-stable) batch order,
        # skipping the steps the interrupted process already took
        skip = self._skip_batches
        self._skip_batches = 0
        self._step_timer.reset()
        for b, batch in enumerate(self._prefetch(self.train_loader)):
            if b < skip:
                continue
            self._step_timer.mark()
            self.state, metrics = self.train_step(
                self.state, batch, self._next_key(), jnp.float32(kl_weight))
            step_losses.append(metrics["loss"])
            for k, v in metrics.items():
                if k != "loss":
                    perf_acc[k].append(v)
            if self._stop_requested:
                # SIGTERM: persist an exact mid-epoch snapshot (state, key
                # stream, position) and unwind — train() stops the run
                save_checkpoint(self.checkpoint_dir, self.state, epoch,
                                self._best_loss, name="latest",
                                key=self._key, batch_in_epoch=b + 1)
                self._preempted = True
                print(f"preempted: saved 'latest' at epoch {epoch} "
                      f"step {b + 1}/{n_batches}; resume with --resume")
                break
        self._step_timer.mark()
        # single host sync per epoch
        step_losses = [float(x) for x in step_losses]
        n_run = len(step_losses)
        base_step = epoch * n_batches + skip
        for i, l in enumerate(step_losses):
            self.writer.scalar("Loss/train_step", l, base_step + i)
        train_loss = sum(step_losses)
        self._logger_dict["Loss/train_epoch"].append(train_loss / max(n_run, 1))
        self._logger_dict["KL_annealing/train_epoch"].append(kl_weight)
        for k, vs in perf_acc.items():
            self._logger_dict[f"Perf_measure_train/{k}"].append(
                float(sum(float(v) for v in vs)) / max(n_batches, 1))
        if self._step_timer.mean_step_time > 0:
            self._logger_dict["Perf/frames_per_sec"].append(
                self._step_timer.frames_per_sec(self.cfg.batchsize))
        return train_loss

    def _test_epoch(self, epoch, kl_weight):
        n_batches = len(self.test_loader)
        losses, perf_acc = [], defaultdict(list)
        last_aux = None
        # never render a stale batch from a previous epoch/configuration when
        # the test loader yields nothing this epoch
        self._last_eval_batch = None
        for batch in self._prefetch(self.test_loader):
            metrics, aux = self.eval_step(
                self.state.params, batch, self._next_key(), jnp.float32(kl_weight))
            losses.append(metrics["loss"])
            for k, v in metrics.items():
                if k != "loss":
                    perf_acc[k].append(v)
            last_aux = aux
            self._last_eval_batch = batch
        val_loss = sum(float(x) for x in losses)
        self._logger_dict["Loss/validation_epoch"].append(val_loss / max(n_batches, 1))
        for k, vs in perf_acc.items():
            self._logger_dict[f"Perf_measure_validation/{k}"].append(
                float(sum(float(v) for v in vs)) / max(n_batches, 1))
        return val_loss, last_aux

    def _write_images(self, epoch, aux, n_images=120):
        """Input / output / target image panels (problems.py:588-614)."""
        if aux is None or "recon_x" not in aux:
            return
        nrow = self.seq_length if self.seq_length > 1 else int(
            np.sqrt(self.cfg.batchsize))
        recon = aux["recon_x"]

        def log(tag, arr):
            arr = np.asarray(arr)
            if arr.ndim != 4:
                return
            self.writer.image_grid(tag, np.clip(arr[:n_images], 0, 1), epoch,
                                   nrow=nrow)

        if isinstance(recon, dict):
            sig = lambda x: jax.nn.sigmoid(x)
            log("Output_img/validation_visual", sig(recon["visual"]))
            log("Output_img/validation_tactile", sig(recon["tactile"]))
        else:
            log("Output_img/validation", jax.nn.sigmoid(recon))

        if (self.vis_pose and self.cfg.use_pose and isinstance(recon, dict)
                and recon.get("pose") is not None
                and getattr(self, "_last_eval_batch", None) is not None):
            # 3-D triad figures (problems.py:605-614, gated by --vis-pose)
            from mmdyn_tpu.problems.specs import parse_batch
            from mmdyn_tpu.utils.plots import (plot_pose_tensorboard,
                                               plot_single_pose_tensorboard)
            ins, tgts = parse_batch(self.cfg, self._last_eval_batch)
            n = min(n_images, 16)   # figures are host-side matplotlib: cap
            self.writer.figure(
                "Pose_validation/input",
                plot_single_pose_tensorboard(
                    np.asarray(ins["pose"])[:n],
                    seq_length=self.seq_length), epoch)
            self.writer.figure(
                "Pose_validation/output_vs_target",
                plot_pose_tensorboard(
                    np.asarray(recon["pose"])[:n],
                    np.asarray(tgts["pose"])[:n],
                    seq_length=self.seq_length), epoch)

    def _sample(self, epoch):
        if self.sample_fn is None:
            return
        k_cond, k_z = jax.random.split(
            jax.random.fold_in(self._sample_key, epoch))
        cond = None
        if self.cfg.conditional:
            cond = jax.random.uniform(k_cond, (50, self.cfg.condition_dim))
        samples = self.sample_fn(self.state.params, k_z, cond)
        for k, v in samples.items():
            arr = np.asarray(v)
            if arr.ndim == 4:
                self.writer.image_grid(f"Samples/latent_space_{k}",
                                       np.clip(arr, 0, 1), epoch)

    # ------------------------------------------------------------------
    def train(self, save=True):
        """Epoch loop (problems.py:193-210) + best-val checkpointing + resume
        snapshots.

        Preemption-safe (beyond-reference, SURVEY §5 "failure detection:
        none"): SIGTERM requests a stop; the loop persists an exact snapshot
        (state + PRNG key + epoch/step position) as 'latest' at the next
        optimizer-step boundary and returns cleanly. Because the loader's
        shuffle is restart-stable and checkpoints carry the key stream, a
        ``--resume`` run continues bit-identically to an uninterrupted one
        (tests/test_train.py::TestPreemption). Single-process only: under a
        multi-host mesh every process must receive the signal for the
        collective checkpoint save to complete.
        """
        import signal
        cfg = self.cfg

        def _request_stop(signum, frame):
            print("SIGTERM received: checkpointing at the next step boundary")
            self._stop_requested = True

        _no_handler = object()
        prev_handler = _no_handler
        try:
            prev_handler = signal.signal(signal.SIGTERM, _request_stop)
        except ValueError:
            pass    # not the main thread (e.g. a test harness): no handler
        try:
            for epoch in range(self._start_epoch, cfg.num_epochs):
                print(f"Epoch: {epoch}")
                kl_weight = anneal_kl(epoch, cfg.annealing_epochs)
                # profile the second epoch (the first pays compilation)
                do_profile = self.profile_dir and epoch == self._start_epoch + 1
                with trace(self.profile_dir if do_profile else None):
                    self._train_epoch(epoch, kl_weight)
                if self._preempted:
                    break
                val_loss, aux = self._test_epoch(epoch, kl_weight)
                last_epoch = epoch == cfg.num_epochs - 1
                if epoch % self.image_interval == 0 or last_epoch:
                    self._sample(epoch)
                    self._write_images(epoch, aux)
                for key in self._logger_dict:
                    self.writer.scalar(key, self._logger_dict[key][-1], epoch)
                self.writer.flush()

                if val_loss < self._best_loss:
                    self._best_loss = val_loss
                    save_checkpoint(self.checkpoint_dir, self.state, epoch,
                                    self._best_loss)
                if (epoch % self.ckpt_interval == 0 or last_epoch
                        or self._stop_requested):
                    save_checkpoint(self.checkpoint_dir, self.state, epoch,
                                    self._best_loss, name="latest",
                                    key=self._key)
                if self._stop_requested:
                    print(f"preempted: saved 'latest' after epoch {epoch}; "
                          f"resume with --resume")
                    break
        finally:
            if prev_handler is not _no_handler:
                signal.signal(signal.SIGTERM, prev_handler or signal.SIG_DFL)

        # hparams + final perf-measures record (problems.py:208)
        perf = {k: v[-1] for k, v in self._logger_dict.items()
                if k.startswith("Perf_measure") and v}
        self.writer.hparams(dataclasses.asdict(self.cfg), perf)

        if save:
            with open(self.log_dir / "results.pkl", "wb") as f:
                pickle.dump(dict(self._logger_dict), f)
        self.writer.close()
        return dict(self._logger_dict)
