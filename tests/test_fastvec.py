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
             "unknownword tomato", "", "jazz " * 20]
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
