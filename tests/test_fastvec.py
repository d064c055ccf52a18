"""Native fastvec vs the Python vectorizer: exact equivalence."""

import numpy as np
import pytest

from context_attentive_ir_tpu.data import build_dictionary
from context_attentive_ir_tpu.data.vectorize import _encode_target, _pad_ids
from context_attentive_ir_tpu.data.objects import Query

fast = pytest.importorskip("context_attentive_ir_tpu.data.fast")

if not fast.available():
    pytest.skip("native fastvec unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def vocab():
    words = ["jazz guitar chord lesson", "hiking boots trail Mountain",
             "pasta recipe tomato"]
    return build_dictionary([w.split() for w in words])


def test_encode_batch_matches_python(vocab):
    fv = fast.FastVocab(vocab)
    assert fv.size == len(vocab)
    texts = ["jazz guitar", "MOUNTAIN trail boots hiking pasta",
             "unknownword tomato", "", "jazz " * 20,
             # full ASCII whitespace set of str.split() (round-3 review:
             # the native tokenizer only split on space/tab/newline)
             "jazz\rguitar\vchord\flesson", "  \r\n pasta\ttomato \v "]
    ids, mask = fv.encode_batch(texts, max_len=8)
    for i, t in enumerate(texts):
        ref_ids, ref_mask = _pad_ids(vocab.encode(t.split()), 8)
        np.testing.assert_array_equal(ids[i], ref_ids, err_msg=t)
        np.testing.assert_array_equal(mask[i], ref_mask, err_msg=t)


def test_encode_targets_matches_python(vocab):
    fv = fast.FastVocab(vocab)
    texts = ["jazz guitar chord", "", "pasta " * 20]
    tin, tout, tmask = fv.encode_targets(texts, max_len=6)
    for i, t in enumerate(texts):
        q = Query(query_id="x", tokens=t.split())
        rin, rout, rmask = _encode_target(q, vocab, 6)
        np.testing.assert_array_equal(tin[i], rin, err_msg=t)
        np.testing.assert_array_equal(tout[i], rout, err_msg=t)
        np.testing.assert_array_equal(tmask[i], rmask, err_msg=t)


def test_fast_batch_builders_match_python():
    """Whole-batch equivalence: fast vs Python rank/session builders."""
    import numpy as np

    from context_attentive_ir_tpu.data import (
        ShapeConfig,
        build_rank_batch,
        build_session_batch,
        generate_sessions,
        rank_examples,
    )
    from context_attentive_ir_tpu.data.objects import Session

    sessions = [Session.from_dict(d)
                for d in generate_sessions(n_sessions=6, n_candidates=5,
                                           seed=9)]
    streams = [q.tokens for s in sessions for q in s.queries]
    streams += [d.tokens for s in sessions for q in s.queries
                for d in q.documents]
    wd = build_dictionary(streams)
    fv = fast.FastVocab(wd)
    shapes = ShapeConfig(max_query_len=6, max_doc_len=8, max_session_len=3,
                         num_candidates=5)
    for s in sessions:
        s.queries = s.queries[:3]
        for q in s.queries:
            q.tokens = q.tokens[:6]
            q.documents = q.documents[:5]
            for d in q.documents:
                d.tokens = d.tokens[:8]

    ex = rank_examples(sessions)
    a = build_rank_batch(ex, wd, shapes, batch_size=len(ex) + 2)
    b = build_rank_batch(ex, wd, shapes, batch_size=len(ex) + 2, fast=fv)
    for f in ("query", "query_mask", "docs", "doc_mask", "labels",
              "cand_mask", "row_mask"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), f)

    a = build_session_batch(sessions, wd, shapes, batch_size=8)
    b = build_session_batch(sessions, wd, shapes, batch_size=8, fast=fv)
    for f in ("query", "query_mask", "docs", "doc_mask", "clicks",
              "cand_mask", "turn_mask", "target_in", "target_out",
              "target_mask", "row_mask"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), f)
