"""Trainer: config -> data -> model -> pjit steps -> checkpoints/metrics.

TPU-native runner replacing PyTorch-Lightning's Trainer (ref main.py:43-62):
  * builds the ('data','model') mesh over all devices (DP over ICI),
  * shards each host batch over the data axis (one fused H2D),
  * drives the pjit'd train/eval steps,
  * Orbax-checkpoints every epoch (keep-all) and logs losses as JSONL +
    stdout instead of TensorBoard,
  * runs the metric bank per test batch and prints the benchmark tables at
    epoch end (ref mainmodel.py test_step/test_epoch_end).
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import numpy as np

from dualpixelface_tpu.data.loader_selector import loader_selector
from dualpixelface_tpu.data.pipeline import DataPipeline, numeric_batch
from dualpixelface_tpu.losses import loss_selector
from dualpixelface_tpu.metrics import metric_selector
from dualpixelface_tpu.models import model_selector
from dualpixelface_tpu.models.base import apply_group_swap
from dualpixelface_tpu.parallel import get_mesh, shard_batch
from dualpixelface_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from dualpixelface_tpu.train.state import create_train_state, param_count
from dualpixelface_tpu.train.steps import make_eval_step, make_train_step


class Trainer:
    def __init__(self, option, mesh=None):
        self.opt = option
        if mesh is None:
            # the data axis must divide the global batch: use the largest
            # device count that does (ref DP scatters any batch; a global-view
            # sharded program is stricter)
            import math

            devices = jax.devices()
            use = math.gcd(int(option.batch_size), len(devices))
            if use < len(devices):
                # Matches the reference's DP semantics (torch DataParallel
                # idles GPUs beyond the batch size, ref main.py:49) — but say
                # so LOUDLY instead of silently shrinking the mesh.
                import warnings

                warnings.warn(
                    f"batch_size={int(option.batch_size)} does not divide the "
                    f"{len(devices)}-device mesh; using only {use} device(s). "
                    f"Set batch_size to a multiple of {len(devices)} to use "
                    f"every chip.",
                    stacklevel=2,
                )
            mesh = get_mesh(devices[:use])
        self.mesh = mesh
        self.model = model_selector(option)
        self.loss_bank = loss_selector(option)
        self.metric_bank = metric_selector(option)
        from dualpixelface_tpu.ops.precision import resolve_policy

        compute_dtype = resolve_policy(option)
        self.train_step = make_train_step(self.model, self.loss_bank, compute_dtype)
        self.eval_step = make_eval_step(self.model, compute_dtype)
        self.state = None
        self._log_file = None
        self._tb = None
        if getattr(option, "output_path", None):
            self._log_file = Path(option.output_path) / "metrics.jsonl"
        # TensorBoard channel (ref main.py:31-33 TensorBoardLogger) when
        # tensorboardX is available; JSONL + stdout remain the primary sinks
        if getattr(option, "logger_path", None):
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(option.logger_path)
            except ImportError:
                self._tb = None
        self._tb_step = 0

    # ---------- setup ----------

    def _pipeline(self, training: bool):
        from dualpixelface_tpu.data.grain_pipeline import make_pipeline

        dataset = loader_selector(self.opt, training)
        # seed=1: seed_everything(1) parity (ref main.py:25)
        return make_pipeline(self.opt, dataset, training, seed=1)

    def init_state(self, sample_batch: dict, steps_per_epoch: int):
        self.state = create_train_state(
            self.model, self.opt, sample_batch, steps_per_epoch
        )
        if self.opt.get("load_model"):
            strict = bool(getattr(self.opt, "load_strict", True))
            self.state = restore_checkpoint(self.opt.load_model, self.state, strict)
        return self.state

    def _log(self, record: dict):
        record = {k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v)
                  for k, v in record.items()}
        print(json.dumps(record), flush=True)
        if self._log_file is not None:
            with open(self._log_file, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self._tb is not None:
            tag = record.get("mode", "train")
            for k, v in record.items():
                if isinstance(v, float):
                    self._tb.add_scalar(f"{tag}/{k}", v, self._tb_step)
            self._tb.flush()
            self._tb_step += 1

    # ---------- loops ----------

    def latest_checkpoint(self):
        """Newest epoch checkpoint in the workspace, or None.

        Basic elastic recovery beyond the reference's manual --load_model
        resume (SURVEY.md §5 'recovery = manual resume'): restarting the same
        run continues from the last saved epoch automatically when
        `auto_resume` is set.
        """
        ckpt_dir = getattr(self.opt, "ckpt_path", None)
        if not ckpt_dir:
            return None, -1
        ckpts = sorted(Path(ckpt_dir).glob("checkpoint_*"))
        if not ckpts:
            return None, -1
        last = ckpts[-1]
        return str(last), int(last.name.split("_")[-1])

    def fit(self, epochs: int | None = None):
        from dualpixelface_tpu.train.optim import scheduler_selector

        epochs = epochs if epochs is not None else self.opt.epoch
        pipe = self._pipeline(training=True)
        steps_per_epoch = len(pipe)
        lr_fn = scheduler_selector(self.opt, steps_per_epoch)
        validate_every = int(self.opt.get("validate_every", 1))
        start_epoch = 0
        resume_path = None
        if self.opt.get("auto_resume"):
            resume_path, last_epoch = self.latest_checkpoint()
            if resume_path is not None:
                start_epoch = last_epoch + 1
                self._log({"mode": "resume", "checkpoint": resume_path, "epoch": start_epoch})
        first = True
        with self.mesh:
            for epoch in range(start_epoch, epochs):
                pipe.set_epoch(epoch)
                t0 = time.time()
                n = 0
                step_losses: list[dict] = []
                # no per-step host sync: loss scalars stay on device and are
                # fetched once per epoch, so dispatch runs ahead of execution
                # and H2D of batch i+1 overlaps step i
                for batch in pipe:
                    batch = numeric_batch(batch)
                    batch.pop("_valid", None)
                    device_batch = shard_batch(batch, self.mesh)
                    if first:
                        self.init_state(device_batch, steps_per_epoch)
                        if resume_path is not None:
                            self.state = restore_checkpoint(resume_path, self.state, strict=True)
                        first = False
                    self.state, losses = self.train_step(self.state, device_batch)
                    step_losses.append(losses)
                    n += 1
                running: dict = {}
                for losses in step_losses:  # single drain at epoch end
                    for k, v in losses.items():
                        running[k] = running.get(k, 0.0) + float(v)
                record = {k: v / max(n, 1) for k, v in running.items()}
                record.update(
                    epoch=epoch, steps=n, sec=round(time.time() - t0, 2),
                    lr=float(lr_fn(int(self.state.step))), mode="train",
                )
                self._log(record)
                if getattr(self.opt, "ckpt_path", None):
                    save_checkpoint(self.opt.ckpt_path, self.state, epoch)
                # per-epoch validation with metric tables (PL parity: the
                # reference validates every epoch with the metric viewer,
                # stereodpnet/mainmodel.py:143-152; batch size differs — we
                # reuse the test pipeline)
                if validate_every and (epoch + 1) % validate_every == 0 and epoch + 1 < epochs:
                    self.test()
        return self.state

    def test(self):
        pipe = self._pipeline(training=False)
        self.metric_bank.clear()
        save_figs = self.opt.get("mode") == "demo" and getattr(self.opt, "output_path", None)
        step_idx = 0
        with self.mesh:
            for batch in pipe:
                if self.state is None:
                    # test-only run: init from the first batch, then restore
                    # the checkpoint given by --load_model (ref model_selector.py:17-26)
                    probe = shard_batch(numeric_batch({k: v for k, v in batch.items()
                                                       if k not in ("_valid",)}), self.mesh)
                    self.init_state(probe, steps_per_epoch=1)
                batch = apply_group_swap(batch, training=False)
                valid = batch.pop("_valid")
                device_batch = shard_batch(numeric_batch(batch), self.mesh)
                results = self.eval_step(self.state, device_batch)
                host_results = jax.tree_util.tree_map(np.asarray, results)
                host_batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
                nvalid = int(valid.sum())
                host_results = jax.tree_util.tree_map(lambda x: x[:nvalid], host_results)
                host_batch = {k: v[:nvalid] for k, v in host_batch.items()}
                if "depth" in host_batch:
                    self.metric_bank(host_results, host_batch)
                if save_figs:
                    from dualpixelface_tpu.utils.visualizer import save_result_fig_depth

                    save_result_fig_depth(self.opt, host_results, host_batch, 0, step_idx, mode="DEMO")
                step_idx += 1
        self.metric_bank.viewer()
        agg = self.metric_bank.aggregate()
        self._log({"mode": "test", **{f"{m}/{k}": v for m, d in agg.items() for k, v in d.items()}})
        return agg
