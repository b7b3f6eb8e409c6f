"""Trainer bookkeeping + observability units (the epoch loop itself is
covered end-to-end by tests/test_end_to_end.py through the train CLI)."""

import json
import math
import os

import numpy as np
import pytest

from resdepth_tpu.train import checkpoint as ckpt_io
from resdepth_tpu.train.metrics import MetricsWriter
from resdepth_tpu.train.trainer import Trainer


def _trainer(tmp_path, **kwargs):
    defaults = dict(state=None, train_step=None, eval_step=None,
                    train_loaders=[], val_loaders=[], n_epochs=1,
                    checkpoint_dir=str(tmp_path / "checkpoints"))
    defaults.update(kwargs)
    return Trainer(**defaults)


def _tiny_tree():
    return {"w": np.zeros(2, np.float32)}


def test_resume_best_loss_honors_copied_best(tmp_path):
    """auto_resume continues from Model_last, whose loss_val is the LAST val
    loss — the carried-forward Model_best's (better) loss must win the
    best-loss bookkeeping or the first mediocre post-resume epoch would
    overwrite Model_best with a worse model. (The reference's
    best_loss = ckpt.loss_val, lib/Trainer.py:136, is only correct when the
    resumed file IS Model_best.)"""
    trainer = _trainer(tmp_path)
    ckpt_io.save_checkpoint(trainer.path_model_best, epoch=40,
                            params=_tiny_tree(), bn_state=_tiny_tree(),
                            loss_val=1.2)
    # resumed checkpoint = Model_last at epoch 60 with a worse val loss
    trainer.resume_from({"epoch": 60, "loss_val": 1.5})
    assert trainer.start_epoch == 61
    assert trainer.best_loss == pytest.approx(1.2)
    assert trainer.index_best_loss == 40

    # resuming Model_best itself (reference flow): its own loss stands
    trainer2 = _trainer(tmp_path)
    trainer2.resume_from({"epoch": 40, "loss_val": 1.1})
    assert trainer2.best_loss == pytest.approx(1.1)

    # no Model_best present: checkpoint's own loss seeds best_loss
    trainer3 = _trainer(tmp_path, checkpoint_dir=str(tmp_path / "fresh"))
    trainer3.resume_from({"epoch": 10, "loss_val": 2.0})
    assert trainer3.best_loss == pytest.approx(2.0)


def test_metrics_jsonl_is_strict_json(tmp_path):
    """Non-finite scalars (e.g. the inf fallback of an empty validation
    epoch) must not emit bare Infinity/NaN tokens — invalid JSON for any
    strict consumer of the metrics mirror."""
    path = str(tmp_path / "metrics.jsonl")
    writer = MetricsWriter(None, path)
    writer.add_scalar("val/MAE_metric", math.inf, 3)
    writer.add_scalar("train/MAE_metric", 0.5, 4)
    writer.add_hparams({"lr": 1e-4}, {"hparam/MAE_metric": math.nan})
    writer.close()

    lines = open(path).read().splitlines()
    parsed = [json.loads(line, parse_constant=lambda tok: pytest.fail(
        f"non-strict JSON token {tok!r} in metrics.jsonl")) for line in lines]
    assert parsed[0]["value"] is None
    assert parsed[1]["value"] == 0.5
    assert parsed[2]["metrics"]["hparam/MAE_metric"] is None


def test_setup_logger_is_idempotent(tmp_path, capsys):
    """Named loggers are process-cached: repeated setup of the same logger
    (per-prediction eval loggers, per-pairlist parsers) must not stack
    handlers and print every line N times."""
    import logging

    from resdepth_tpu.utils.logging import (add_console_logger,
                                            add_file_logger, setup_logger)

    name = "idempotency_probe"
    log_file = str(tmp_path / "probe.log")
    for _ in range(3):
        logger = setup_logger(name, log_to_console=True, log_file=log_file)
        add_console_logger(logger)
        add_file_logger(logger, log_file)
    handlers = logging.getLogger(name).handlers
    assert len([h for h in handlers if type(h) is logging.StreamHandler]) == 1
    assert len([h for h in handlers
                if isinstance(h, logging.FileHandler)]) == 1

    logger.info("exactly once")
    assert open(log_file).read().count("exactly once") == 1

    # a second, distinct file coexists (per-pair report loggers)
    other = str(tmp_path / "other.log")
    add_file_logger(logger, other)
    assert len([h for h in logging.getLogger(name).handlers
                if isinstance(h, logging.FileHandler)]) == 2


def test_epoch_chunks_full_in_multi_region_configs(tmp_path):
    """Chunks are built per loader BEFORE the cross-loader shuffle: with n
    regions a global batch-level shuffle leaves same-loader runs of ~n/(n-1)
    batches and the steps_per_call multi-step program would almost never
    run. Every non-tail chunk must be full-size."""
    k = 8
    n_loaders, batches_per_loader = 4, 20
    loaders = [(None, [(f"L{i}", j) for j in range(batches_per_loader)])
               for i in range(n_loaders)]
    trainer = _trainer(tmp_path, train_loaders=loaders, steps_per_call=k,
                       train_step_multi=object())

    chunks = trainer._epoch_chunks(loaders)
    # all batches consumed exactly once
    seen = [b for _, chunk in chunks for b in chunk]
    assert len(seen) == n_loaders * batches_per_loader
    assert len(set(seen)) == len(seen)
    # chunk sizes: full k except one tail per loader (20 = 2*8 + 4)
    sizes = sorted(len(chunk) for _, chunk in chunks)
    assert sizes == [4] * n_loaders + [k] * (2 * n_loaders)
    # chunks are single-loader
    for loader_id, chunk in chunks:
        assert {b[0] for b in chunk} == {f"L{loader_id}"}
    # order is shuffled deterministically (seeded rng)
    trainer_b = _trainer(tmp_path, train_loaders=loaders, steps_per_call=k,
                         train_step_multi=object())
    assert [c for _, c in trainer_b._epoch_chunks(loaders)] == \
        [c for _, c in chunks]


def test_ema_plateau_scheduler_follows_served_val_loss(tmp_path):
    """Under training_settings.ema_decay, Trainer.validate scores the SERVED
    (EMA) weights and that loss drives ReduceLROnPlateau — by design: LR
    reacts to the model actually being selected/checkpointed. This is the
    one deliberate epoch-level EMA side channel (the per-step optimizer
    update itself never sees the EMA; test_train.py::
    test_ema_matches_manual_recurrence_and_is_passive)."""
    import jax
    import jax.numpy as jnp

    from resdepth_tpu.train.optim import build_optimizer
    from resdepth_tpu.train.schedulers import ReduceLROnPlateau
    from resdepth_tpu.train.step import init_train_state

    params = {"w": jnp.zeros((2,), jnp.float32)}
    bn = {}
    tx = build_optimizer("Adam", 0.0)
    state = init_train_state(params, bn, tx, 1e-2, ema=True)
    # force EMA weights != raw iterate so the two candidate val losses differ
    state = state.replace(ema_params={"w": jnp.ones((2,), jnp.float32)})
    assert state.serve_params is state.ema_params

    # fake eval: loss = 2 * mean(w)  -> 0.0 on raw params, 2.0 on the EMA
    def eval_step(p, bn_state, rasters, positions, pair_idx, bounds,
                  weights, key):
        loss = 2.0 * jnp.mean(p["w"])
        return loss, jnp.float32(1.0)

    seen = []

    class SpyPlateau(ReduceLROnPlateau):
        def step(self, metric=None):
            seen.append(float(metric))
            return super().step(metric)

    # patience 0: every non-improving epoch reduces immediately
    scheduler = SpyPlateau(initial_lr=1e-2, factor=0.5, patience=0)
    val_loaders = [(None, [(None, None, None, None)])]
    trainer = _trainer(tmp_path, state=state, eval_step=eval_step,
                       val_loaders=val_loaders, scheduler=scheduler,
                       n_epochs=3, evaluate_rate=1)
    trainer.train()

    # the scheduler saw the EMA val loss, never the raw-iterate loss
    assert seen == [pytest.approx(2.0)] * 3
    # epoch 0 sets best=2.0; epochs 1,2 are non-improving -> two reductions
    assert float(trainer.state.lr) == pytest.approx(1e-2 * 0.25)
