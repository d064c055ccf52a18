"""The training engine: epoch loop, validation, early stopping, resume.

Parity target: the reference's per-task train drivers (SURVEY.md SS2.9
'Task drivers', SS3.1): seed, load data, build vocab, init-or-resume model,
epoch loop with AverageMeter/Timer and ``--display_iter`` logging, per-epoch
official validation, early stopping on ``--valid_metric``, best/latest
checkpointing, final test eval + prediction dump.

TPU-first: the hot loop is (host collate -> ``shard_batch`` -> one compiled
``train_step``); everything else (metrics, checkpoint IO) is off the
device path.  Data order is deterministic and resumable (epoch-boundary
checkpoints + seeded per-epoch shuffles, SURVEY.md SS5.3).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from ..config import ModelConfig, RunConfig
from ..data import (
    BatchIterator,
    BucketedIterator,
    Dictionary,
    Session,
    ShapeConfig,
    build_rank_batch,
    build_session_batch,
    build_suggest_batch,
    rank_examples,
    suggest_examples,
)
from ..data.pipeline import PackedBucketedIterator, PackedIterator, prefetch
from ..models import build_model, task_family
from ..parallel.mesh import make_mesh, shard_batch
from ..utils import AverageMeter, MetricsWriter, Timer, format_table
from .checkpoint import Checkpointer
from .evaluate import build_decode_fn, official_eval
from .state import TrainState, create_train_state, param_count
from .steps import make_score_step, make_train_step

logger = logging.getLogger(__name__)


def shapes_from_config(config: ModelConfig) -> ShapeConfig:
    from ..constants import MAX_WORD_LEN

    return ShapeConfig(
        max_query_len=config.max_query_len,
        max_doc_len=config.max_doc_len,
        max_session_len=config.max_session_len,
        num_candidates=config.num_candidates,
        max_word_len=MAX_WORD_LEN if config.use_charngram else 0,
    )


def make_iterator(sessions: list[Session], config: ModelConfig,
                  word_dict: Dictionary, batch_size: int,
                  shuffle: bool, seed: int, fast=None,
                  session_buckets: tuple[int, ...] = (),
                  pack: bool = False):
    """Batch family mirrors the reference's three Dataset families.

    ``fast`` is an optional ``data.fast.FastVocab`` handle routing the
    hot vectorization loops through the native fastvec library.
    ``pack=True`` vectorizes the whole example list once and serves
    batches as row gathers (``data.pipeline.PackedIterator`` -- the
    reference ``--data_workers`` analogue, bit-identical batch stream);
    bucketed multitask iteration packs one superbatch per bucket
    (``PackedBucketedIterator``).
    """
    family = task_family(config.model_type)
    shapes = shapes_from_config(config)
    if family == "ranker":
        ex = rank_examples(sessions)
        collate = lambda e, batch_size=batch_size: build_rank_batch(
            e, word_dict, shapes, batch_size=batch_size, fast=fast)
    elif family == "recommender":
        ex = suggest_examples(sessions)
        collate = lambda e, batch_size=batch_size: build_suggest_batch(
            e, word_dict, shapes, batch_size=batch_size)
    else:
        ex = sessions
        if session_buckets:
            import dataclasses as _dc

            buckets = tuple(min(b, shapes.max_session_len)
                            for b in session_buckets)

            def collate_b(e, bucket, batch_size=batch_size):
                sh = _dc.replace(shapes, max_session_len=bucket)
                return build_session_batch(e, word_dict, sh,
                                           batch_size=batch_size, fast=fast)

            if pack and ex:
                it = PackedBucketedIterator(
                    ex, lambda s: len(s.queries), collate_b, batch_size,
                    buckets, shuffle=shuffle, seed=seed)
                logger.info("packed %d sessions into %.1f MB across %d "
                            "buckets", len(ex), it.nbytes / 2**20,
                            len(it._packs))
                return it
            return BucketedIterator(ex, lambda s: len(s.queries),
                                    collate_b, batch_size, buckets,
                                    shuffle=shuffle, seed=seed)
        collate = lambda e, batch_size=batch_size: build_session_batch(
            e, word_dict, shapes, batch_size=batch_size, fast=fast)
    if pack and ex:
        it = PackedIterator(ex, collate, batch_size, shuffle=shuffle,
                            seed=seed)
        logger.info("packed %d examples into %.1f MB (one-time collate)",
                    len(ex), it.nbytes / 2**20)
        return it
    return BatchIterator(ex, collate, batch_size, shuffle=shuffle, seed=seed)


class Trainer:
    """Owns model + state + compiled steps + checkpointing for one run."""

    def __init__(self, config: ModelConfig, run: RunConfig,
                 word_dict: Dictionary,
                 pretrained: Optional[np.ndarray] = None,
                 use_mesh: bool = True):
        if config.vocab_size == 0:
            config = config.replace(vocab_size=len(word_dict))
        self.config = config
        self.run = run
        self.word_dict = word_dict
        self.mesh = make_mesh() if use_mesh else None
        if self.mesh is not None and run.batch_size % self.mesh.size != 0:
            raise ValueError(
                f"batch_size {run.batch_size} not divisible by mesh size "
                f"{self.mesh.size}")
        self.model = build_model(config, pretrained)
        self.train_step = make_train_step(self.model, config, self.mesh)
        self.score_fn = make_score_step(self.model, config, self.mesh)
        family = task_family(config.model_type)
        self.decode_fn = None
        if family in ("recommender", "multitask"):
            self.decode_fn = build_decode_fn(
                self.model, config, run.beam_size,
                run.max_decode_len or None, run=run)
        self.ckpt = Checkpointer(run.model_dir, run.model_name,
                                 run.async_checkpoint,
                                 backend=run.checkpoint_backend)
        self.metrics = MetricsWriter(
            Path(run.model_dir) / f"{run.model_name}.metrics.jsonl",
            tensorboard=run.tensorboard)
        self.rng = jax.random.key(run.seed)
        self.state: Optional[TrainState] = None
        self.start_epoch = 0
        self.best_valid = -np.inf
        self.fast = None
        if run.native_vectorizer:
            try:
                from ..data.fast import FastVocab, available

                if available():
                    self.fast = FastVocab(word_dict)
                    logger.info("native fastvec vectorizer enabled")
            except Exception as e:  # pragma: no cover - env dependent
                logger.info("native fastvec unavailable: %s", e)

    # -- state setup ---------------------------------------------------------

    def init_state(self, example_batch):
        init_rng = jax.random.key(self.run.seed)
        self.state = create_train_state(self.model, self.config,
                                        example_batch, init_rng)
        logger.info("Initialized %s with %.2fM parameters",
                    self.config.model_type,
                    param_count(self.state) / 1e6)
        if self.run.pretrained_path:
            # warm start: weights only (reference --pretrained)
            self.state = self.state.replace(params=Checkpointer.load(
                self.run.pretrained_path, self.state).params)
            logger.info("Warm-started from %s", self.run.pretrained_path)
        if (self.run.resume and
                Checkpointer.resolve(self.ckpt.latest_path).exists()):
            _, _, extra = Checkpointer.peek(self.ckpt.latest_path)
            self.state = Checkpointer.load(self.ckpt.latest_path, self.state)
            self.start_epoch = int(extra.get("epoch", -1)) + 1
            self.best_valid = float(extra.get("best_valid", -np.inf))
            logger.info("Resumed from %s at epoch %d",
                        self.ckpt.latest_path, self.start_epoch)
        if self.mesh is not None:
            from ..parallel.mesh import replicated
            self.state = jax.device_put(self.state, replicated(self.mesh))

    # -- training ------------------------------------------------------------

    def fit(self, train_sessions: list[Session],
            dev_sessions: list[Session]) -> dict:
        run, config = self.run, self.config
        train_it = make_iterator(train_sessions, config, self.word_dict,
                                 run.batch_size, shuffle=True, seed=run.seed,
                                 fast=self.fast,
                                 session_buckets=run.session_buckets,
                                 pack=run.pack_cache)
        dev_batches = list(make_iterator(
            dev_sessions, config, self.word_dict, run.test_batch_size,
            shuffle=False, seed=0, fast=self.fast))
        if self.state is None:
            first = next(iter(train_it.epoch(0)))
            self.init_state(first)

        no_improve = 0
        history = []
        for epoch in range(self.start_epoch, run.num_epochs):
            loss_meter, timer = AverageMeter(), Timer()
            m = None
            # prefetch: host-collate batch t+1..t+depth while the device
            # runs batch t (the reference --data_workers overlap)
            for i, batch in enumerate(prefetch(train_it.epoch(epoch),
                                               run.prefetch_batches)):
                if self.mesh is not None:
                    batch = shard_batch(batch, self.mesh)
                self.state, m = self.train_step(self.state, batch, self.rng)
                # materializing the loss forces a device sync; sample it at
                # display intervals so dispatch runs ahead of the device
                sampled = (i + 1) % run.display_iter == 0
                if sampled:
                    loss_meter.update(float(m["loss"]))
                    logger.info(
                        "epoch %d iter %d/%d loss %.4f (avg %.4f) %.1fs",
                        epoch, i + 1, len(train_it), loss_meter.val,
                        loss_meter.avg, timer.time())
            # fold in the final batch unless the display interval just did
            if m is not None and not sampled:
                loss_meter.update(float(m["loss"]))
            valid = self.validate(dev_batches)
            self.metrics.write("epoch", step=epoch, epoch=epoch,
                               train_loss=loss_meter.avg,
                               time=timer.time(), **valid)
            metric_val = valid.get(run.valid_metric, 0.0)
            history.append({"epoch": epoch, "train_loss": loss_meter.avg,
                            **valid})
            logger.info("epoch %d done: train_loss=%.4f %s=%.4f (best %.4f)",
                        epoch, loss_meter.avg, run.valid_metric, metric_val,
                        max(self.best_valid, metric_val))
            extra = {"epoch": epoch, "best_valid": float(
                max(self.best_valid, metric_val))}
            self.ckpt.save_latest(self.state, config, self.word_dict, extra)
            if metric_val > self.best_valid:
                self.best_valid = metric_val
                no_improve = 0
                self.ckpt.save_best(self.state, config, self.word_dict,
                                    extra)
            else:
                no_improve += 1
                if no_improve >= run.early_stop:
                    logger.info("Early stopping at epoch %d", epoch)
                    break
        self.ckpt.wait()
        logger.info("\n%s", format_table(history, "training history"))
        return {"best_valid": self.best_valid, "history": history}

    # -- evaluation ----------------------------------------------------------

    def validate(self, dev_batches: list, dump_prefix=None) -> dict:
        batches = dev_batches
        if self.mesh is not None:
            batches = [shard_batch(b, self.mesh) for b in dev_batches]
        return official_eval(self.model, self.config, self.state.params,
                             batches, self.word_dict,
                             score_fn=self.score_fn,
                             decode_fn=self.decode_fn,
                             dump_prefix=dump_prefix)

    def test(self, test_sessions: list[Session],
             from_best: bool = True, dump_prefix=None) -> dict:
        """Final official test eval (reference SS3.3/SS3.4)."""
        if from_best and Checkpointer.resolve(self.ckpt.best_path).exists():
            self.ckpt.wait()
            if self.state is None:
                it = make_iterator(test_sessions, self.config,
                                   self.word_dict, self.run.test_batch_size,
                                   shuffle=False, seed=0)
                self.init_state(next(iter(it.epoch(0))))
            self.state = Checkpointer.load(self.ckpt.best_path, self.state)
        batches = list(make_iterator(
            test_sessions, self.config, self.word_dict,
            self.run.test_batch_size, shuffle=False, seed=0,
            fast=self.fast))
        out = self.validate(batches, dump_prefix=dump_prefix)
        logger.info("\n%s", format_table([out], "test results"))
        self.metrics.write("test", **out)
        return out
