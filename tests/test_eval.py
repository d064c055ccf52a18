"""Metric-function tests against hand-computed values and nltk BLEU
(SURVEY.md SS4)."""

import numpy as np
import pytest

from context_attentive_ir_tpu.eval import (
    average_precision,
    bleu_metrics,
    corpus_bleu,
    corpus_rouge_l,
    exact_match,
    ndcg_at_k,
    precision_at_k,
    ranking_metrics,
    reciprocal_rank,
    token_f1,
)


def _row(scores, labels):
    s = np.array([scores], dtype=np.float32)
    l = np.array([labels], dtype=np.float32)
    m = np.ones_like(s, dtype=bool)
    return s, l, m


def test_average_precision_hand():
    # ranking by score: items in order [3,1,2] (scores 0.9,0.5,0.2)
    # labels of that order: [1, 0, 1] -> AP = (1/1 + 2/3)/2 = 0.8333
    s, l, m = _row([0.5, 0.2, 0.9], [0, 1, 1])
    np.testing.assert_allclose(average_precision(s, l, m), [5.0 / 6.0],
                               atol=1e-6)


def test_reciprocal_rank_hand():
    s, l, m = _row([0.9, 0.5, 0.2], [0, 0, 1])
    np.testing.assert_allclose(reciprocal_rank(s, l, m), [1.0 / 3.0])
    s, l, m = _row([0.1, 0.5, 0.2], [0, 1, 0])
    np.testing.assert_allclose(reciprocal_rank(s, l, m), [1.0])


def test_ndcg_hand():
    # ranked labels [0, 1, 1]; DCG = 1/log2(3) + 1/log2(4)
    # ideal [1, 1, 0]; IDCG = 1 + 1/log2(3)
    s, l, m = _row([0.9, 0.5, 0.2], [0, 1, 1])
    dcg = 1 / np.log2(3) + 1 / np.log2(4)
    idcg = 1 + 1 / np.log2(3)
    np.testing.assert_allclose(ndcg_at_k(s, l, m, 10), [dcg / idcg], atol=1e-6)
    np.testing.assert_allclose(ndcg_at_k(s, l, m, 1), [0.0])


def test_precision_at_k():
    s, l, m = _row([0.9, 0.5, 0.2], [1, 0, 1])
    np.testing.assert_allclose(precision_at_k(s, l, m, 1), [1.0])
    np.testing.assert_allclose(precision_at_k(s, l, m, 3), [2.0 / 3.0])


def test_masked_candidates_excluded():
    s = np.array([[0.1, 0.9, 0.5]], dtype=np.float32)
    l = np.array([[1.0, 1.0, 0.0]], dtype=np.float32)
    m = np.array([[True, False, True]])  # candidate 1 invalid
    # valid ranking: [2, 0] labels [0, 1] -> AP=0.5, RR=0.5
    np.testing.assert_allclose(average_precision(s, l, m), [0.5])
    np.testing.assert_allclose(reciprocal_rank(s, l, m), [0.5])


def test_ranking_metrics_aggregation():
    scores = np.array([[0.9, 0.1], [0.1, 0.9], [0.5, 0.4]], np.float32)
    labels = np.array([[1, 0], [1, 0], [0, 0]], np.float32)
    mask = np.ones_like(scores, bool)
    out = ranking_metrics(scores, labels, mask)
    # third row has no positive -> excluded; MAP = (1 + 0.5)/2
    assert out["n_queries"] == 2
    np.testing.assert_allclose(out["map"], 0.75)
    np.testing.assert_allclose(out["mrr"], 0.75)


def test_bleu_perfect_and_zero():
    hyp = [["a", "b", "c", "d"]]
    refs = [[["a", "b", "c", "d"]]]
    b = corpus_bleu(hyp, refs)
    np.testing.assert_allclose(b, [1.0, 1.0, 1.0, 1.0])
    b0 = corpus_bleu([["x", "y"]], [[["a", "b"]]])
    np.testing.assert_allclose(b0, [0.0] * 4)


def test_bleu_matches_nltk():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import corpus_bleu as nltk_bleu

    hyps = [["the", "cat", "sat", "on", "mat"],
            ["dogs", "run", "fast", "outside"],
            ["a", "b"]]
    refs = [[["the", "cat", "sat", "on", "the", "mat"]],
            [["dogs", "run", "quickly", "outside", "today"]],
            [["a", "b", "c"]]]
    ours = corpus_bleu(hyps, refs, max_n=2)
    ref1 = nltk_bleu(refs, hyps, weights=(1.0,))
    ref2 = nltk_bleu(refs, hyps, weights=(0.5, 0.5))
    np.testing.assert_allclose(ours[0], ref1, atol=1e-9)
    np.testing.assert_allclose(ours[1], ref2, atol=1e-9)


def test_bleu_brevity_penalty():
    hyp = [["a", "b"]]
    refs = [[["a", "b", "c", "d"]]]
    b = corpus_bleu(hyp, refs)
    np.testing.assert_allclose(b[0], np.exp(1 - 4 / 2) * 1.0, atol=1e-9)


def test_bleu_metrics_dict():
    m = bleu_metrics([["a"]], [[["a"]]])
    assert set(m) == {"bleu-1", "bleu-2", "bleu-3", "bleu-4"}


def test_rouge_l_hand():
    # hyp "a b c", ref "a c d": LCS=2, P=2/3, R=2/3 -> F ~ 2/3
    val = corpus_rouge_l([["a", "b", "c"]], [[["a", "c", "d"]]])
    beta = 1.2
    p = r = 2 / 3
    f = (1 + beta**2) * p * r / (r + beta**2 * p)
    np.testing.assert_allclose(val, f, atol=1e-9)
    assert corpus_rouge_l([["x"]], [[["y"]]]) == 0.0


def test_em_f1():
    assert exact_match([["a", "b"]], [["a", "b"]]) == 1.0
    assert exact_match([["a"]], [["a", "b"]]) == 0.0
    np.testing.assert_allclose(
        token_f1([["a", "b"]], [["a", "c"]]), 0.5)


def test_suggestion_dump_has_per_sentence_scores(tmp_path):
    """Prediction dumps carry per-example BLEU/ROUGE/F1 (reference-style
    per-example files)."""
    import json

    import jax.numpy as jnp

    from context_attentive_ir_tpu.data import (
        Dictionary,
        build_dictionary,
        build_suggest_batch,
        ShapeConfig,
    )
    from context_attentive_ir_tpu.data.objects import Query
    from context_attentive_ir_tpu.train.evaluate import evaluate_suggestions

    wd = build_dictionary([["alpha", "beta", "gamma"]])
    shapes = ShapeConfig(max_query_len=4, max_doc_len=4, max_session_len=2,
                         num_candidates=2)
    qs = [Query("a", ["alpha", "beta"], [])]
    ex = [(qs, qs[0], Query("b", ["alpha", "gamma"], []))]
    batch = build_suggest_batch(ex, wd, shapes, batch_size=1)

    # fake decoder emitting the reference tokens followed by EOS
    target = batch.target_out[0]

    def decode_fn(params, b):
        return jnp.asarray(target[None, :])

    out = evaluate_suggestions(decode_fn, None, [batch], wd,
                               dump_path=tmp_path / "h.jsonl")
    rec = json.loads((tmp_path / "h.jsonl").read_text().splitlines()[0])
    assert rec["hypothesis"] == "alpha gamma"
    assert rec["f1"] == 1.0 and rec["bleu-4"] > 0
    assert out["em"] == 1.0
