"""Training engine: epoch loop, validation, checkpointing, observability.

Parity with /root/reference/lib/Trainer.py:13-318 —
  * per-epoch train pass over all training datasets, periodic validation
    every ``evaluate_rate`` epochs, denormalised masked MAE [m] as the sole
    metric,
  * train metric averaged and logged every ``freq_average_train_loss``
    iterations (reference default 20, lib/utils.py:406),
  * best / periodic / last checkpoint roles; LR scheduler stepped once per
    VALIDATION epoch (ReduceLROnPlateau consumes the val metric),
  * warm-start restore incl. optimizer/scheduler state and epoch arithmetic
    (start_epoch = ckpt.epoch + 1, n_epochs += start_epoch —
    lib/Trainer.py:113-143),
  * TensorBoard scalars + hparams-on-best + JSONL mirror.

Quirk guard (SURVEY.md quirk register): the reference crashes if a periodic
checkpoint epoch precedes the first validation epoch (lib/Trainer.py:303-306
references val stats unconditionally); here the periodic save simply reuses
the latest known val loss (or None).

TPU-specific behaviour: per-step device metrics are accumulated as device
scalars and only materialised at logging points, so the host never blocks the
step pipeline; batches from different datasets shard over the mesh inside the
jitted step.
"""

from __future__ import annotations

import logging
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from resdepth_tpu.train import checkpoint as ckpt_io
from resdepth_tpu.utils import profiler
from resdepth_tpu.train.metrics import AverageMeter, MetricsWriter
from resdepth_tpu.train.step import TrainState
from resdepth_tpu.utils import fs
from resdepth_tpu.utils.logging import setup_logger


class Trainer:
    def __init__(self, *, state: TrainState, train_step, eval_step,
                 train_step_multi=None, steps_per_call: int = 1,
                 train_loaders, val_loaders, scheduler=None, n_epochs: int,
                 evaluate_rate: int = 1, save_model_rate: int = 20,
                 freq_average_train_loss: int = 20, checkpoint_dir: str,
                 log_file: str | None = None, tboard_log_dir: str | None = None,
                 metrics_jsonl: str | None = None, hparams: dict | None = None,
                 rng_seed: int = 0, logger: logging.Logger | None = None,
                 profile_dir: str | None = None,
                 group_chunks_by_loader: bool = False):
        """
        ``train_loaders`` / ``val_loaders``: lists of
        ``(rasters, batch_iterator)`` pairs, one per dataset region (the
        reference concatenates regions via ConcatDataset,
        lib/utils.py:264-267; here each jitted step consumes batches from
        one region and the region order is shuffled per epoch). Element 0
        is either a resident ``DeviceRasters`` or a lazy residency
        provider with ``resolve()``/``release()`` (``FullResident`` /
        ``BandWindow``, data/banded.py) resolved per chunk via
        ``_resolve_rasters``; element 1 yields index batches
        (``BatchIndexIterator`` or a banded ``_BandView``).
        """
        self.state = state
        self.train_step = train_step
        self.train_step_multi = train_step_multi
        self.steps_per_call = steps_per_call if train_step_multi is not None else 1
        self.eval_step = eval_step
        self.train_loaders = train_loaders
        self.val_loaders = val_loaders
        self.scheduler = scheduler
        self.n_epochs = n_epochs
        self.evaluate_rate = evaluate_rate
        self.save_model_rate = save_model_rate
        self.freq_average_train_loss = freq_average_train_loss
        self.group_chunks_by_loader = group_chunks_by_loader

        fs.make_dir(checkpoint_dir)
        self.checkpoint_dir = checkpoint_dir
        self.path_model_best = os.path.join(checkpoint_dir, "Model_best.npz")
        self.path_model_last = os.path.join(checkpoint_dir, "Model_last.npz")

        self.logger = logger or setup_logger("train_logger", log_to_console=True,
                                             log_file=log_file)
        # Under a multi-process launch (parallel/bootstrap.py) only the
        # chief writes checkpoints and metrics — every process still runs
        # the full train/val loops (the collectives inside the jitted steps
        # need all participants) and the replicated state is identical, so
        # non-chief writes would be redundant races on shared storage.
        from resdepth_tpu.parallel.bootstrap import is_chief
        self.is_chief = is_chief()
        self.writer = (MetricsWriter(tboard_log_dir, metrics_jsonl)
                       if self.is_chief else MetricsWriter(None, None))
        self._checkpointer = ckpt_io.AsyncCheckpointer()
        self.hparams = hparams or {}

        self.start_epoch = 0
        self.best_loss = math.inf
        self.index_best_loss = math.inf
        self.epoch_rng = np.random.default_rng(rng_seed)
        self.base_key = jax.random.PRNGKey(rng_seed)
        self._last_val_loss = None
        self._last_train_loss = None
        self.profile_dir = profile_dir

    # ------------------------------ resume ------------------------------ #

    def resume_from(self, meta: dict) -> None:
        """Apply warm-start bookkeeping after state restoration."""
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.n_epochs += self.start_epoch
        if meta.get("loss_val") is not None:
            self.best_loss = float(meta["loss_val"])
            self.index_best_loss = int(meta.get("epoch", -1))
        # The reference seeds best_loss from the resumed checkpoint's own
        # loss_val (lib/Trainer.py:136), which is only correct when the
        # resumed file IS Model_best. auto_resume continues from Model_last,
        # whose (usually worse) last val loss would let the carried-forward
        # Model_best be overwritten by a worse model — honour the copied
        # best checkpoint's loss instead when it is better.
        if os.path.isfile(self.path_model_best):
            try:
                best_meta = ckpt_io.load_meta(self.path_model_best)
            except Exception as exc:
                self.logger.warning(
                    f"Could not read {self.path_model_best} for best-loss "
                    f"bookkeeping: {exc}")
            else:
                if best_meta.get("loss_val") is not None and \
                        float(best_meta["loss_val"]) < self.best_loss:
                    self.best_loss = float(best_meta["loss_val"])
                    self.index_best_loss = int(best_meta.get("epoch", -1))
        if self.scheduler is not None and meta.get("scheduler_state"):
            self.scheduler.load_state_dict(meta["scheduler_state"])
            self.state = self.state.replace(
                lr=jnp.asarray(self.scheduler.lr, jnp.float32))
        elif meta.get("lr") is not None:
            # No scheduler state to replay, but the checkpoint records the
            # optimizer's LR at save time (the reference restores it through
            # optimizer.load_state_dict, lib/Trainer.py:126).
            self.state = self.state.replace(
                lr=jnp.asarray(float(meta["lr"]), jnp.float32))
        self.logger.info(f"\n\nRestoring the pretrained model from epoch "
                         f"{self.start_epoch}.")
        self.logger.info(f"Current best loss {self.best_loss}\n")

    # ------------------------------ training ----------------------------- #

    def _lr(self) -> float:
        return float(self.state.lr)

    def _epoch_batches(self, loaders, shuffle_order: bool):
        batches = []
        for loader_id, (rasters, iterator) in enumerate(loaders):
            for batch in iterator:
                batches.append((loader_id, batch))
        if shuffle_order:
            self.epoch_rng.shuffle(batches)
        return batches

    def _epoch_chunks(self, loaders):
        """Each loader's batch stream grouped into steps_per_call chunks
        FIRST, then the chunk order shuffled across loaders.

        Chunking before shuffling keeps chunks full in multi-region configs:
        a global batch-level shuffle leaves expected same-loader runs of only
        ~n/(n-1) batches across n regions, so nearly every chunk would fall
        short of ``steps_per_call`` and the fused multi-step program would
        silently never run. Returns ``(loader_id, [batch, ...])`` pairs with
        chunk length ``steps_per_call`` (dispatched as one scanned program)
        or shorter tails (dispatched per-batch).

        ``group_chunks_by_loader`` keeps each loader's chunks CONTIGUOUS
        (loader order and within-loader chunk order both reshuffled per
        epoch) — required under banded residency (data/banded.py), where
        each loader is one band window and interleaving would thrash the
        host->device window swaps.
        """
        k = self.steps_per_call
        per_loader = []
        for loader_id, (rasters, iterator) in enumerate(loaders):
            batches = list(iterator)
            per_loader.append([(loader_id, batches[i:i + k])
                               for i in range(0, len(batches), k)])
        if self.group_chunks_by_loader:
            for chunks in per_loader:
                self.epoch_rng.shuffle(chunks)
            self.epoch_rng.shuffle(per_loader)
            return [c for chunks in per_loader for c in chunks]
        chunks = [c for loader_chunks in per_loader for c in loader_chunks]
        self.epoch_rng.shuffle(chunks)
        return chunks

    @staticmethod
    def _resolve_rasters(obj):
        """Loader element 0 is DeviceRasters or a lazy provider (banded
        residency's BandWindow / the FullResident twin — data/banded.py)."""
        return obj.resolve() if hasattr(obj, "resolve") else obj

    @staticmethod
    def _release_rasters(loaders):
        for provider, _ in loaders:
            if hasattr(provider, "release"):
                provider.release()

    def train_one_epoch(self, epoch: int) -> AverageMeter:
        meter = AverageMeter()
        pending = []  # device scalars, materialised lazily at logging points
        chunks = self._epoch_chunks(self.train_loaders)
        num_iter = sum(len(chunk) for _, chunk in chunks)
        key = jax.random.fold_in(self.base_key, epoch)
        c_iter = -1

        for loader_id, chunk in chunks:
            rasters = self._resolve_rasters(self.train_loaders[loader_id][0])
            if len(chunk) == self.steps_per_call and self.train_step_multi is not None \
                    and self.steps_per_call > 1:
                stacked = [np.stack(arrays) for arrays in zip(*chunk)]
                self.state, metrics = self.train_step_multi(
                    self.state, rasters, *stacked, key)
                pending.extend(metrics[i] for i in range(len(chunk)))
                c_iter += len(chunk)
            else:
                for positions, pair_idx, bounds, weights in chunk:
                    self.state, metric = self.train_step(
                        self.state, rasters, positions, pair_idx, bounds,
                        weights, key)
                    pending.append(metric)
                    c_iter += 1

            if len(pending) >= self.freq_average_train_loss:
                # One stacked transfer instead of per-scalar round-trips
                # (device->host latency dominates on tunneled/remote devices).
                for value in np.asarray(jnp.stack(pending)):
                    meter.update(float(value))
                pending.clear()
                curr_iter = num_iter * epoch + (c_iter + 1)
                self.writer.add_scalar("train/MAE_metric", meter.avg, curr_iter)
                self.writer.add_scalar("train/learning_rate", self._lr(), curr_iter)
                self.logger.info(f"train:\tEpoch: {epoch} [{c_iter + 1}/{num_iter}]\t"
                                 f"MAE_metric: {meter.avg:.6f}")
                self._last_train_loss = meter.avg
                meter.reset()

        if pending:
            for value in np.asarray(jnp.stack(pending)):
                meter.update(float(value))
        if meter.count:
            self._last_train_loss = meter.avg
        return meter

    def validate(self, epoch: int) -> float:
        meter = AverageMeter()
        key = jax.random.PRNGKey(0)  # eval path consumes no randomness
        pending = []
        # Banded residency: drop the training band window before the val
        # windows come up so the budget is not held twice across the
        # train->val boundary (no-op for resident DeviceRasters loaders).
        self._release_rasters(self.train_loaders)
        for loader_id, batch in self._epoch_batches(self.val_loaders,
                                                    shuffle_order=False):
            rasters = self._resolve_rasters(self.val_loaders[loader_id][0])
            positions, pair_idx, bounds, weights = batch
            # serve_params: the EMA weights under training_settings.ema_decay
            # (the model checkpoints/serving use), else the raw iterate.
            pending.append(self.eval_step(
                self.state.serve_params, self.state.bn_state, rasters,
                positions, pair_idx, bounds, weights, key))
        if pending:
            sums = np.asarray(jnp.stack([num for num, _ in pending]))
            counts = np.asarray(jnp.stack([den for _, den in pending]))
            for num, den in zip(sums, counts):
                if den > 0:
                    meter.update(float(num) / float(den))
        loss = meter.avg if meter.count else math.inf
        # Symmetric to the entry release: the val band window is only needed
        # during validation (the scores above are materialised already).
        self._release_rasters(self.val_loaders)
        self.writer.add_scalar("val/MAE_metric", loss, epoch)
        self.writer.add_scalar("val/learning_rate", self._lr(), epoch)
        self.logger.info(f"\nval:\tEpoch: {epoch}\t\tMAE_metric: {loss:.6f}\n")
        return loss

    def _save(self, path: str, epoch: int) -> None:
        if not self.is_chief:
            return
        # Async: device-side snapshot now, fetch + write in a worker thread
        # (the device->host transfer otherwise stalls the step pipeline).
        # Under an EMA, 'params' holds the SERVED (EMA) weights — every
        # consumer (test.py, .pth export, warm start) picks them up with no
        # special handling — and the raw optimizer iterate rides along as
        # 'raw_params' for exact resume.
        ema = self.state.ema_params is not None
        self._checkpointer.save(
            path, epoch=epoch, params=self.state.serve_params,
            bn_state=self.state.bn_state, opt_state=self.state.opt_state,
            raw_params=self.state.params if ema else None,
            lr=self._lr(), loss_train=self._last_train_loss,
            loss_val=self._last_val_loss,
            scheduler_state=(self.scheduler.state_dict()
                             if self.scheduler is not None else None))

    def train(self) -> None:
        self.logger.info("Start training...\n")
        start_time = time.time()
        epoch = self.start_epoch

        for epoch in range(self.start_epoch, self.n_epochs):
            header = f"Epoch {epoch}/{self.n_epochs - 1}"
            self.logger.info("\n{}\n{}\n".format(header, "-" * len(header)))

            # Profile the first trained epoch when a trace directory is set.
            with profiler.trace(self.profile_dir if epoch == self.start_epoch
                                else None):
                self.train_one_epoch(epoch)

            if (epoch + 1) % self.evaluate_rate == 0:
                val_loss = self.validate(epoch)
                self._last_val_loss = val_loss

                if val_loss < self.best_loss:
                    self.best_loss = val_loss
                    self.index_best_loss = epoch
                    self._save(self.path_model_best, epoch)
                    self.writer.add_hparams(
                        dict(self.hparams),
                        {"hparam/MAE_metric": val_loss})

                if self.scheduler is not None:
                    new_lr = self.scheduler.step(val_loss)
                    if new_lr != self._lr():
                        self.state = self.state.replace(
                            lr=jnp.asarray(new_lr, jnp.float32))

            if (epoch + 1) % self.save_model_rate == 0 and epoch > self.evaluate_rate:
                name = f"Model_after_{epoch + 1}_epochs.npz"
                self._save(os.path.join(self.checkpoint_dir, name), epoch)

        elapsed = time.time() - start_time
        self.logger.info("\n\nTraining finished!\nTraining time: {}".format(
            time.strftime("%H:%M:%S", time.gmtime(elapsed))))
        self.logger.info(f"\nBest model at epoch: {self.index_best_loss}")
        self.logger.info("Validation loss of the best model: {:.6f}".format(
            self.best_loss))
        self.writer.close()
        self._save(self.path_model_last, epoch)
        self._checkpointer.wait()  # Model_last must exist when train() returns
        self._release_rasters(self.train_loaders)
        self._release_rasters(self.val_loaders)
