"""Host input pipeline: pack-once cache + prefetch overlap
(VERDICT r4 missing #2 -- the reference --data_workers analogue)."""

import numpy as np
import pytest

from context_attentive_ir_tpu.config import RunConfig, default_config
from context_attentive_ir_tpu.data import (
    BatchIterator,
    ShapeConfig,
    build_dictionary,
    build_rank_batch,
    build_session_batch,
    build_suggest_batch,
    generate_sessions,
    load_data,
    rank_examples,
    suggest_examples,
    write_fixture,
)
from context_attentive_ir_tpu.data.pipeline import PackedIterator, prefetch


def _sessions(tmp_path, n=13):
    p = write_fixture(tmp_path / "s.jsonl", n_sessions=n, n_candidates=5,
                      seed=0)
    return load_data(str(p), max_query_len=6, max_doc_len=8,
                     num_candidates=5, max_session_len=4)


def _dict(sessions):
    streams = []
    for s in sessions:
        for q in s.queries:
            streams.append(q.tokens)
            for d in q.documents:
                streams.append(d.tokens)
    return build_dictionary(streams)


SHAPES = ShapeConfig(max_query_len=6, max_doc_len=8, max_session_len=4,
                     num_candidates=5)


# -- prefetch ----------------------------------------------------------


def test_prefetch_preserves_order_and_values():
    items = list(range(57))
    assert list(prefetch(iter(items), depth=3)) == items
    assert list(prefetch(iter(items), depth=0)) == items  # disabled path


def test_prefetch_propagates_producer_exception():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_exception_survives_full_queue_and_slow_consumer():
    """Round-5 review fix: a producer exception raised while the queue
    is full must wait for space, not be dropped after a timeout (the
    consumer can sit in a minutes-long device step; a swallowed error
    left it hanging forever at the next get())."""
    import time

    def gen():
        yield 1
        yield 2  # fills depth=2; the raise then meets a full queue
        raise ValueError("late boom")

    it = prefetch(gen(), depth=2)
    time.sleep(1.5)  # > the old 1.0 s put timeout that dropped the error
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="late boom"):
        next(it)


def test_prefetch_early_close_stops_producer():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    for _ in range(3):
        next(it)
    it.close()  # must not hang; producer blocked on put() observes stop
    assert len(produced) < 10_000


# -- packed iterator ---------------------------------------------------


def _assert_batches_equal(a, b):
    import jax

    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("family", ["rank", "suggest", "session"])
def test_packed_iterator_bit_identical(tmp_path, family):
    """PackedIterator yields the exact batch stream BatchIterator yields
    (same shuffle, same padding, same short final batch) -- packing is a
    pure host-speed optimization."""
    sessions = _sessions(tmp_path)
    wd = _dict(sessions)
    bs = 4
    if family == "rank":
        ex = rank_examples(sessions)
        collate = lambda e, batch_size=bs: build_rank_batch(
            e, wd, SHAPES, batch_size=batch_size)
    elif family == "suggest":
        ex = suggest_examples(sessions)
        collate = lambda e, batch_size=bs: build_suggest_batch(
            e, wd, SHAPES, batch_size=batch_size)
    else:
        ex = sessions
        collate = lambda e, batch_size=bs: build_session_batch(
            e, wd, SHAPES, batch_size=batch_size)
    assert len(ex) % bs != 0  # exercise the short final batch
    base = BatchIterator(ex, collate, bs, shuffle=True, seed=3)
    packed = PackedIterator(ex, collate, bs, shuffle=True, seed=3)
    assert len(base) == len(packed)
    for epoch in (0, 1):
        for ba, bp in zip(base.epoch(epoch), packed.epoch(epoch)):
            _assert_batches_equal(ba, bp)
    # resume contract: start_batch skips identically
    for ba, bp in zip(base.epoch(1, start_batch=2),
                      packed.epoch(1, start_batch=2)):
        _assert_batches_equal(ba, bp)


def test_packed_iterator_charngram_fields(tmp_path):
    """Optional char fields (query_chars/doc_chars) ride the row gather."""
    sessions = _sessions(tmp_path, n=5)
    wd = _dict(sessions)
    shapes = ShapeConfig(max_query_len=6, max_doc_len=8, max_session_len=4,
                         num_candidates=5, max_word_len=8)
    ex = rank_examples(sessions)
    collate = lambda e, batch_size=4: build_rank_batch(
        e, wd, shapes, batch_size=batch_size)
    base = BatchIterator(ex, collate, 4, shuffle=False, seed=0)
    packed = PackedIterator(ex, collate, 4, shuffle=False, seed=0)
    for ba, bp in zip(base.epoch(0), packed.epoch(0)):
        assert bp.query_chars is not None
        _assert_batches_equal(ba, bp)


def test_trainer_pack_and_prefetch_match_unpacked(tmp_path):
    """End-to-end: a packed+prefetched fit reproduces the unpacked fit's
    loss history exactly (the pipeline changes WHEN collate happens, not
    what the model sees)."""
    from context_attentive_ir_tpu.train import Trainer

    sessions = _sessions(tmp_path, n=10)
    wd = _dict(sessions)
    cfg = default_config("dssm").replace(
        vocab_size=len(wd), emsize=16, nhid_ffnn=16, max_query_len=6,
        max_doc_len=8, num_candidates=5, max_session_len=4)
    histories = []
    for pack, depth in ((False, 0), (True, 2)):
        run = RunConfig(model_dir=str(tmp_path / f"runs{pack}"),
                        model_name="m", batch_size=8, num_epochs=2,
                        display_iter=100, async_checkpoint=False,
                        pack_cache=pack, prefetch_batches=depth)
        tr = Trainer(cfg, run, wd, use_mesh=False)
        out = tr.fit(sessions, sessions)
        histories.append([h["train_loss"] for h in out["history"]])
    assert histories[0] == histories[1]


def test_packed_bucketed_iterator_bit_identical(tmp_path):
    """PackedBucketedIterator reproduces BucketedIterator's exact plan
    and batches (per-bucket static shapes, same rng consumption)."""
    import dataclasses as _dc

    from context_attentive_ir_tpu.data import BucketedIterator
    from context_attentive_ir_tpu.data.pipeline import (
        PackedBucketedIterator,
    )

    sessions = _sessions(tmp_path, n=11)
    wd = _dict(sessions)

    def collate_b(e, bucket, batch_size=4):
        sh = _dc.replace(SHAPES, max_session_len=bucket)
        return build_session_batch(e, wd, sh, batch_size=batch_size)

    kw = dict(batch_size=4, buckets=(2, 4), shuffle=True, seed=7)
    base = BucketedIterator(sessions, lambda s: len(s.queries),
                            collate_b, **kw)
    packed = PackedBucketedIterator(sessions, lambda s: len(s.queries),
                                    collate_b, **kw)
    assert len(base) == len(packed)
    for epoch in (0, 1):
        n = 0
        for ba, bp in zip(base.epoch(epoch), packed.epoch(epoch)):
            _assert_batches_equal(ba, bp)
            n += 1
        assert n == len(base)
    for ba, bp in zip(base.epoch(0, start_batch=1),
                      packed.epoch(0, start_batch=1)):
        _assert_batches_equal(ba, bp)
