"""Model zoo smoke tests: init + forward shapes + grad flow for all 14
models (SURVEY.md SS4 'jit-compile smoke tests per model')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from context_attentive_ir_tpu.config import (
    MULTITASK,
    RANKERS,
    RECOMMENDERS,
    default_config,
)
from context_attentive_ir_tpu.data import (
    ShapeConfig,
    build_dictionary,
    build_rank_batch,
    build_session_batch,
    build_suggest_batch,
    generate_sessions,
    rank_examples,
    suggest_examples,
)
from context_attentive_ir_tpu.data.objects import Session
from context_attentive_ir_tpu.models import build_model, task_family

SHAPES = ShapeConfig(max_query_len=6, max_doc_len=8, max_session_len=3,
                     num_candidates=5)
B = 2


def small_config(model_type, vocab_size):
    return default_config(model_type).replace(
        vocab_size=vocab_size, emsize=16, nhid=8, nhid_ffnn=16, nfilters=8,
        max_query_len=SHAPES.max_query_len, max_doc_len=SHAPES.max_doc_len,
        max_session_len=SHAPES.max_session_len,
        num_candidates=SHAPES.num_candidates)


@pytest.fixture(scope="module")
def data():
    sessions = [Session.from_dict(d)
                for d in generate_sessions(n_sessions=4, n_candidates=5,
                                           seed=3)]
    for s in sessions:
        s.queries = s.queries[:SHAPES.max_session_len]
        for q in s.queries:
            q.tokens = q.tokens[:SHAPES.max_query_len]
            q.documents = q.documents[:SHAPES.num_candidates]
            for d in q.documents:
                d.tokens = d.tokens[:SHAPES.max_doc_len]
    streams = [q.tokens for s in sessions for q in s.queries]
    streams += [d.tokens for s in sessions for q in s.queries
                for d in q.documents]
    word_dict = build_dictionary(streams)
    return sessions, word_dict


def _batch_for(model_type, sessions, word_dict):
    fam = task_family(model_type)
    if fam == "ranker":
        return build_rank_batch(rank_examples(sessions)[:B], word_dict,
                                SHAPES, batch_size=B)
    if fam == "recommender":
        return build_suggest_batch(suggest_examples(sessions)[:B], word_dict,
                                   SHAPES, batch_size=B)
    return build_session_batch(sessions[:B], word_dict, SHAPES, batch_size=B)


@pytest.mark.parametrize("model_type", RANKERS)
def test_ranker_forward(model_type, data):
    sessions, word_dict = data
    cfg = small_config(model_type, len(word_dict))
    model = build_model(cfg)
    batch = _batch_for(model_type, sessions, word_dict)
    params = model.init({"params": jax.random.key(0)}, batch, True)
    scores = model.apply(params, batch, True)
    assert scores.shape == (B, SHAPES.num_candidates)
    assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.parametrize("model_type", RECOMMENDERS)
def test_recommender_forward(model_type, data):
    sessions, word_dict = data
    cfg = small_config(model_type, len(word_dict))
    model = build_model(cfg)
    batch = _batch_for(model_type, sessions, word_dict)
    params = model.init({"params": jax.random.key(0)}, batch, True)
    out = model.apply(params, batch, True)
    assert out.shape == (B, SHAPES.max_target_len, len(word_dict))
    out_np = np.asarray(out, np.float32)
    assert np.isfinite(out_np).all()
    if model_type == "acg":  # probabilities, normalized
        np.testing.assert_allclose(out_np.sum(-1), 1.0, atol=1e-3)


@pytest.mark.parametrize("model_type", MULTITASK)
def test_multitask_forward(model_type, data):
    sessions, word_dict = data
    cfg = small_config(model_type, len(word_dict))
    model = build_model(cfg)
    batch = _batch_for(model_type, sessions, word_dict)
    params = model.init({"params": jax.random.key(0)}, batch, True)
    out = model.apply(params, batch, True)
    S, N, Lt = (SHAPES.max_session_len, SHAPES.num_candidates,
                SHAPES.max_target_len)
    assert out["scores"].shape == (B, S, N)
    assert out["gen_logits"].shape == (B, S, Lt, len(word_dict))
    # score method matches forward scores
    scores2 = model.apply(params, batch, method=model.score)
    np.testing.assert_allclose(np.asarray(out["scores"]),
                               np.asarray(scores2), atol=1e-5)


def test_esm_with_pretrained_beats_random(data):
    """End-to-end sanity: ESM + topic embeddings ranks clicked docs above
    distractors on the synthetic fixture (SURVEY.md SS4 'ESM as floor')."""
    from context_attentive_ir_tpu.eval import ranking_metrics

    sessions, word_dict = data
    rng = np.random.RandomState(0)
    table = rng.normal(scale=1.0, size=(len(word_dict), 16)).astype(
        np.float32)
    table[0] = 0
    cfg = small_config("esm", len(word_dict))
    model = build_model(cfg, pretrained=table)
    ex = rank_examples(sessions)
    batch = build_rank_batch(ex, word_dict, SHAPES, batch_size=len(ex))
    params = model.init({"params": jax.random.key(0)}, batch, True)
    scores = np.asarray(model.apply(params, batch, True))
    m = ranking_metrics(scores, batch.labels, batch.cand_mask,
                        batch.row_mask)
    # clicked docs share words with the query -> shared-word embeddings give
    # high cosine; must beat the random floor (~ (1/N) sum 1/k ≈ 0.45)
    assert m["map"] > 0.6, m


def test_cars_no_click_leakage(data):
    """Ranking scores at turn t must not change when the clicks at turn t
    change (clicks are the labels being predicted)."""
    sessions, word_dict = data
    cfg = small_config("cars", len(word_dict))
    model = build_model(cfg)
    batch = _batch_for("cars", sessions, word_dict)
    params = model.init({"params": jax.random.key(0)}, batch, True)
    s1 = np.asarray(model.apply(params, batch, method=model.score))
    # flip clicks at the LAST valid turn of row 0
    t_last = int(batch.turn_mask[0].sum()) - 1
    clicks = batch.clicks.copy()
    clicks[0, t_last] = 1.0 - clicks[0, t_last]
    batch2 = batch.replace(clicks=clicks)
    s2 = np.asarray(model.apply(params, batch2, method=model.score))
    np.testing.assert_allclose(s1[0, t_last], s2[0, t_last], atol=1e-6)


def test_cars_ablation_variants(data):
    """CARS component ablations (paper SS4 parity; config.cars_ablation):
    each variant runs all inference paths, and the structural
    information-flow properties hold -- no_click_flow makes ranking
    click-invariant, no_context_attn makes turn t's scores blind to
    earlier turns; full CARS is neither (scripts/cars_ablation.py holds
    the trained counterpart)."""
    sessions, word_dict = data
    batch = _batch_for("cars", sessions, word_dict)
    t_last = int(batch.turn_mask[0].sum()) - 1
    assert t_last >= 1

    def scores_for(ablation, batch):
        cfg = small_config("cars", len(word_dict)).replace(
            cars_ablation=ablation)
        model = build_model(cfg)
        params = model.init({"params": jax.random.key(0)}, batch, True)
        model.apply(params, batch, method=model.decode_init)  # smoke
        return params, model, np.asarray(
            model.apply(params, batch, method=model.score))

    # flip turn-0 clicks: only the click-flow can carry that to later turns
    clicks = batch.clicks.copy()
    clicks[0, 0] = 1.0 - clicks[0, 0]
    b_click = batch.replace(clicks=clicks)
    # swap turn-0's query with turn-1's: only history paths can carry it
    query = batch.query.copy()
    qmask = batch.query_mask.copy()
    query[0, 0], qmask[0, 0] = batch.query[0, 1], batch.query_mask[0, 1]
    b_query = batch.replace(query=query, query_mask=qmask)

    for ablation in ("none", "no_click_flow", "no_context_attn"):
        params, model, s0 = scores_for(ablation, batch)
        assert np.isfinite(s0).all(), ablation
        sc = np.asarray(model.apply(params, b_click, method=model.score))
        sq = np.asarray(model.apply(params, b_query, method=model.score))
        d_click = np.abs(s0[0, t_last] - sc[0, t_last]).max()
        d_query = np.abs(s0[0, t_last] - sq[0, t_last]).max()
        # the SUGGESTION head must honour the same information-flow
        # contract (the decoder init carries the session flows; under
        # no_context_attn they are blinded too -- cars._decoder_inputs)
        g0 = np.asarray(model.apply(params, batch, True)["gen_logits"])
        gc = np.asarray(model.apply(params, b_click, True)["gen_logits"])
        gq = np.asarray(model.apply(params, b_query, True)["gen_logits"])
        dg_click = np.abs(g0[0, t_last] - gc[0, t_last]).max()
        dg_query = np.abs(g0[0, t_last] - gq[0, t_last]).max()
        if ablation == "none":
            assert "click_flow" in params["params"]
            assert d_click > 1e-6 and d_query > 1e-6
            assert dg_click > 1e-6 and dg_query > 1e-6
        elif ablation == "no_click_flow":
            assert "click_flow" not in params["params"]
            assert d_click < 1e-6          # clicks never reach ranking
            assert d_query > 1e-6          # query history still does
            assert dg_click < 1e-6         # ... nor the decoder
            assert dg_query > 1e-6
        else:  # no_context_attn: turn t sees only its own query + slate
            assert d_click < 1e-6 and d_query < 1e-6
            assert dg_click < 1e-6 and dg_query < 1e-6


def test_dssm_charngram(data):
    """DSSM with the char-CNN word-hashing analogue (--use_charngram)."""
    from context_attentive_ir_tpu.data import build_rank_batch, rank_examples
    from context_attentive_ir_tpu.data.vectorize import ShapeConfig as SC

    sessions, word_dict = data
    shapes = SC(max_query_len=SHAPES.max_query_len,
                max_doc_len=SHAPES.max_doc_len,
                max_session_len=SHAPES.max_session_len,
                num_candidates=SHAPES.num_candidates, max_word_len=8)
    cfg = small_config("dssm", len(word_dict)).replace(use_charngram=True)
    model = build_model(cfg)
    batch = build_rank_batch(rank_examples(sessions)[:B], word_dict, shapes,
                             batch_size=B)
    assert batch.query_chars is not None
    assert batch.query_chars.shape == (B, SHAPES.max_query_len, 8)
    params = model.init({"params": jax.random.key(0)}, batch, True)
    scores = model.apply(params, batch, True)
    assert scores.shape == (B, SHAPES.num_candidates)
    assert "char_cnn" in params["params"]


def test_gru_and_multilayer_variants(data):
    """--rnn_type gru and --nlayers 2 paths (reference Encoder flags)."""
    sessions, word_dict = data
    for kw in ({"rnn_type": "gru", "session_rnn_type": "gru"},
               {"nlayers": 2}, {"bidirection": False}):
        cfg = small_config("mnsrf", len(word_dict)).replace(**kw)
        model = build_model(cfg)
        batch = _batch_for("mnsrf", sessions, word_dict)
        params = model.init({"params": jax.random.key(0)}, batch, True)
        out = model.apply(params, batch, True)
        assert np.isfinite(np.asarray(out["scores"], np.float32)).all(), kw


def test_suggest_fast_encode_paths_equivalent(data):
    """decode_init's suggestion-only encoders (clicked-docs-only for CARS,
    query-only for MNSRF/M-MatchTensor) must reproduce the full
    encode_session quantities exactly."""
    sessions, word_dict = data

    # CARS: sparse click gather == full-slate click_repr (exact when
    # clicks/turn <= suggest_max_clicks)
    cfg = small_config("cars", len(word_dict))
    model = build_model(cfg)
    batch = _batch_for("cars", sessions, word_dict)
    params = model.init({"params": jax.random.key(0)}, batch, True)
    _, qv_f, _, sq_f, sc_f = model.apply(params, batch, True,
                                         method=model.encode_session)
    _, qv_s, sq_s, sc_s = model.apply(params, batch, True,
                                      method=model.encode_session_suggest)
    np.testing.assert_allclose(np.asarray(qv_s), np.asarray(qv_f),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sq_s), np.asarray(sq_f),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sc_s), np.asarray(sc_f),
                               atol=1e-5, rtol=1e-5)

    # MNSRF / M-MatchTensor: query-only sess == encode_session's sess
    for name in ("mnsrf", "m_match_tensor"):
        cfg = small_config(name, len(word_dict))
        model = build_model(cfg)
        batch = _batch_for(name, sessions, word_dict)
        params = model.init({"params": jax.random.key(0)}, batch, True)
        full = model.apply(params, batch, True,
                           method=model.encode_session)
        sess_fast = model.apply(params, batch, True,
                                method=model.encode_queries)
        np.testing.assert_allclose(np.asarray(sess_fast),
                                   np.asarray(full[2]), atol=1e-5,
                                   rtol=1e-5), name


def test_suggest_click_cap_guard(data):
    """Turns with more clicks than suggest_max_clicks must NOT be silently
    approximated: build_decode_fn detects the violation on host and
    dispatches to the exact full-slate decode_init_full (VERDICT r2 weak
    #5 / next-round #6)."""
    from context_attentive_ir_tpu.models.multitask.cars import (
        clicks_exceed_suggest_cap,
    )
    from context_attentive_ir_tpu.train.evaluate import build_decode_fn

    sessions, word_dict = data
    cfg = small_config("cars", len(word_dict)).replace(
        suggest_max_clicks=2, dropout=0.0, dropout_emb=0.0, dropout_rnn=0.0)
    model = build_model(cfg)
    batch = _batch_for("cars", sessions, word_dict)
    clicks = batch.clicks.copy()
    clicks[0, 0] = 0.0
    clicks[0, 0, :3] = 1.0  # exactly 3 clicks on a turn with cap 2
    batch = batch.replace(clicks=clicks)
    assert clicks_exceed_suggest_cap(batch, 2)
    assert not clicks_exceed_suggest_cap(batch, 3)
    params = model.init({"params": jax.random.key(0)}, batch, True)

    # the fast init really is approximate here (the guard is load-bearing)
    _, mem_fast, _ = model.apply(params, batch, method=model.decode_init)
    _, mem_full, _ = model.apply(params, batch,
                                 method=model.decode_init_full)
    assert np.abs(np.asarray(mem_fast) - np.asarray(mem_full)).max() > 1e-6

    # cap-respecting config (cap >= N gathers every clicked doc): exact,
    # no fallback -- this is the ground truth
    ref_fn = build_decode_fn(model, cfg.replace(suggest_max_clicks=5),
                             beam_size=1)
    ref = np.asarray(ref_fn(params["params"], batch))
    assert getattr(ref_fn, "fallbacks", 0) == 0

    fn = build_decode_fn(model, cfg, beam_size=1)
    out = np.asarray(fn(params["params"], batch))
    assert fn.fallbacks == 1
    np.testing.assert_array_equal(out, ref)

    # under-cap batches stay on the fast path
    ok = batch.replace(clicks=np.zeros_like(batch.clicks))
    fn(params["params"], ok)
    assert fn.fallbacks == 1


@pytest.mark.parametrize("model_type", RANKERS)
def test_ranker_pad_content_invariance(model_type, data):
    """Scores must not depend on token ids in MASKED doc/query positions
    (round-3 review: DUET's local branch max-pooled over padded doc
    positions; the property is worth pinning for the whole zoo)."""
    sessions, word_dict = data
    cfg = small_config(model_type, len(word_dict))
    model = build_model(cfg)
    batch = _batch_for(model_type, sessions, word_dict)
    params = model.init({"params": jax.random.key(0)}, batch, True)
    s0 = np.asarray(model.apply(params, batch, True))

    rng = np.random.RandomState(0)
    docs = batch.docs.copy()
    scribble = rng.randint(4, len(word_dict), size=docs.shape)
    docs = np.where(batch.doc_mask, docs, scribble).astype(docs.dtype)
    query = batch.query.copy()
    scribble_q = rng.randint(4, len(word_dict), size=query.shape)
    query = np.where(batch.query_mask, query,
                     scribble_q).astype(query.dtype)
    s1 = np.asarray(model.apply(
        params, batch.replace(docs=docs, query=query), True))
    np.testing.assert_allclose(s0, s1, atol=1e-5, err_msg=model_type)


def test_multitask_rank_head_dropout_active(data):
    """config.dropout reaches the multitask rank MLP during training
    (round-3 review: the heads hardcoded deterministic=True)."""
    sessions, word_dict = data
    cfg = small_config("cars", len(word_dict)).replace(dropout=0.5)
    model = build_model(cfg)
    batch = _batch_for("cars", sessions, word_dict)
    params = model.init({"params": jax.random.key(0),
                         "dropout": jax.random.key(1)}, batch, False)
    o1 = np.asarray(model.apply(params, batch, False,
                                rngs={"dropout": jax.random.key(2)})
                    ["scores"])
    o2 = np.asarray(model.apply(params, batch, False,
                                rngs={"dropout": jax.random.key(3)})
                    ["scores"])
    det = np.asarray(model.apply(params, batch, True)["scores"])
    assert np.abs(o1 - o2).max() > 1e-6       # stochastic in train mode
    assert np.isfinite(det).all()
