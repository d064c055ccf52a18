"""Discriminative-corpus tests: falsifiable quality gates (VERDICT.md r1 #1).

The topic-overlap fixture is solvable by word overlap (untrained ESM got
MAP 0.98 in round 1), so it cannot detect a broken context-attention head.
The ambiguous corpus (data/synthetic.py) is built so the click is decidable
ONLY from session history; these tests assert that property structurally,
via untrained oracles, and via an actual trained CARS-vs-DSSM gate.
"""

import numpy as np
import pytest

from context_attentive_ir_tpu.config import RunConfig, default_config
from context_attentive_ir_tpu.data import build_dictionary, load_embeddings
from context_attentive_ir_tpu.data.objects import Session
from context_attentive_ir_tpu.data.synthetic import (
    N_CONFUSERS,
    generate_ambiguous_sessions,
)
from context_attentive_ir_tpu.eval import ranking_metrics
from context_attentive_ir_tpu.train import Trainer


def _sessions(**kw):
    return generate_ambiguous_sessions(**kw)


# ---------------------------------------------------------------------------
# structural properties
# ---------------------------------------------------------------------------


def test_equal_overlap_on_ambiguous_turns():
    """Clicked and confuser docs overlap the query identically (the tie a
    session-blind ranker cannot break)."""
    for sess in _sessions(n_sessions=48, n_candidates=8, seed=3):
        for t, q in enumerate(sess["query"]):
            qt = set(q["text"].split())
            clicked = [c for c in q["candidates"] if c["label"] == 1]
            assert len(clicked) == 1
            ov_clicked = len(qt & set(clicked[0]["title"].split()))
            confusers = sorted(
                (len(qt & set(c["title"].split())) for c in q["candidates"]
                 if c["label"] == 0), reverse=True)[:N_CONFUSERS]
            keyed_turn = t == 0 and any(
                "sa" in w or "sb" in w for w in qt)
            if keyed_turn:  # query-keyed turn 0 is decidable by overlap
                assert ov_clicked > max(confusers)
            else:
                assert ov_clicked == max(confusers) == min(confusers)


def test_sense_balance():
    """Each (group, chain, mode) appears with both senses equally often, so
    no blind prior helps."""
    from collections import Counter

    counts = Counter()
    for sess in _sessions(n_sessions=96, n_candidates=8, seed=0):
        q0 = sess["query"][0]
        clicked = next(c for c in q0["candidates"] if c["label"] == 1)
        sense_words = [w for w in clicked["title"].split()
                       if "sa" in w or "sb" in w]
        group = sense_words[0][:2]
        sense = "a" if "sa" in sense_words[0] else "b"
        counts[(group, sense)] += 1
    by_group = {}
    for (g, s), n in counts.items():
        by_group.setdefault(g, {})[s] = n
    for g, d in by_group.items():
        assert d.get("a", 0) == d.get("b", 0), (g, d)


def test_suggestion_requires_context():
    """There exist session pairs with an identical current query but
    different next queries (disambiguated only by earlier turns)."""
    sessions = _sessions(n_sessions=48, n_candidates=8, seed=0)
    succ: dict[str, set[str]] = {}
    for sess in sessions:
        qs = [q["text"] for q in sess["query"]]
        for cur, nxt in zip(qs, qs[1:]):
            succ.setdefault(cur, set()).add(nxt)
    ambiguous_successors = [k for k, v in succ.items() if len(v) > 1]
    assert ambiguous_successors, "no context-dependent suggestion targets"


# ---------------------------------------------------------------------------
# oracle separation (no training needed)
# ---------------------------------------------------------------------------


def _oracle_maps(sessions: list[dict]) -> tuple[float, float]:
    """MAP of (a) the strongest session-blind ranker (word overlap with
    deterministic tie-break) and (b) a context oracle that knows the
    session's sense."""
    rng = np.random.RandomState(0)
    blind_scores, ctx_scores, labels = [], [], []
    for sess in sessions:
        q0 = sess["query"][0]
        clicked0 = next(c for c in q0["candidates"] if c["label"] == 1)
        sense_tag = next(w[:4] for w in clicked0["title"].split()
                         if "sa" in w or "sb" in w)  # e.g. "g3sa"
        for q in sess["query"]:
            qt = set(q["text"].split())
            b_row, c_row, l_row = [], [], []
            for c in q["candidates"]:
                dt = set(c["title"].split())
                ov = len(qt & dt)
                b_row.append(ov + 1e-3 * rng.rand())  # random tie-break
                c_row.append(ov + (1.0 if any(w.startswith(sense_tag)
                                              for w in dt) else 0.0))
                l_row.append(float(c["label"]))
            blind_scores.append(b_row)
            ctx_scores.append(c_row)
            labels.append(l_row)
    labels = np.asarray(labels, np.float32)
    cand = np.ones_like(labels, bool)
    rows = np.ones((labels.shape[0],), bool)
    blind = ranking_metrics(np.asarray(blind_scores, np.float32), labels,
                            cand, rows)["map"]
    ctx = ranking_metrics(np.asarray(ctx_scores, np.float32), labels,
                          cand, rows)["map"]
    return blind, ctx


def test_oracle_separation():
    """Even a perfect word-overlap ranker is capped well below a context
    oracle -- the corpus is discriminative by construction."""
    sessions = _sessions(n_sessions=192, n_candidates=10, seed=7)
    blind, ctx = _oracle_maps(sessions)
    assert ctx > 0.99, ctx
    assert blind < 0.70, blind
    assert ctx - blind > 0.3


# ---------------------------------------------------------------------------
# trained capability gate: CARS must beat session-blind DSSM
# ---------------------------------------------------------------------------

GATE_DIMS = dict(emsize=32, nhid=32, nhid_ffnn=64, nfilters=8,
                 max_query_len=3, max_doc_len=5, max_session_len=5,
                 num_candidates=6, dropout=0.0, dropout_emb=0.0,
                 dropout_rnn=0.0)


@pytest.fixture(scope="module")
def gate_data():
    # query-keyed sessions only: learnable by any session-aware model, yet
    # provably out of reach for session-blind rankers (oracle test above)
    kw = dict(n_candidates=6, n_groups=3, modes=("query",))
    train = [Session.from_dict(d) for d in _sessions(
        n_sessions=240, seed=0, **kw)]
    test = [Session.from_dict(d) for d in _sessions(
        n_sessions=48, seed=2, **kw)]
    streams = [q.tokens for s in train for q in s.queries]
    streams += [d.tokens for s in train for q in s.queries
                for d in q.documents]
    word_dict = build_dictionary(streams)
    return train, test, word_dict


def test_cars_ranking_capability_gate(gate_data):
    """THE ranking capability gate, distilled (VERDICT r2 next-round #7):
    on a corpus where relevance depends on session history, CARS must
    cross the session-blind tie ceiling (~0.58-0.65 here, pinned by
    test_oracle_separation and by the trained-DSSM full gate below) by a
    wide margin within a FIXED budget.  Recipe chosen from a 2-lr x
    3-seed sweep: lr 3e-3 sometimes never transitions within 60 epochs
    (the round-2 flake), lr 5e-3 transitioned by epoch 50-60 in 3/3 seeds
    (final MAP 0.96-1.0); budget capped at 75 epochs with early exit.  A
    broken context-attention head stays at the ceiling and fails --
    verified by ablation (round 3): with CARS.context_attend patched to
    return qv (no history), best MAP over the full 75-epoch budget was
    0.634 < 0.80 on this exact recipe."""
    import jax

    from context_attentive_ir_tpu.models import build_model
    from context_attentive_ir_tpu.train import (
        create_train_state,
        make_iterator,
        make_train_step,
    )
    from context_attentive_ir_tpu.train.evaluate import evaluate_ranker
    from context_attentive_ir_tpu.train.steps import make_score_step

    train, test, word_dict = gate_data
    cfg = default_config("cars").replace(
        vocab_size=len(word_dict), learning_rate=5e-3, **GATE_DIMS)
    model = build_model(cfg)
    it = make_iterator(train, cfg, word_dict, batch_size=24, shuffle=True,
                       seed=1)
    state = create_train_state(model, cfg, next(iter(it.epoch(0))),
                               jax.random.key(1))
    step = make_train_step(model, cfg)
    score_fn = make_score_step(model, cfg)
    test_batches = list(make_iterator(test, cfg, word_dict, batch_size=24,
                                      shuffle=False, seed=0))
    rng = jax.random.key(2)
    cars_map = 0.0
    for epoch in range(75):
        for batch in it.epoch(epoch):
            state, _ = step(state, batch, rng)
        if epoch >= 39 and (epoch % 5 == 4):
            cars_map = evaluate_ranker(score_fn, state.params,
                                       test_batches)["map"]
            if cars_map >= 0.80:
                break
    assert cars_map >= 0.80, cars_map


@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="full trained-DSSM-vs-CARS gate; the distilled "
                           "fixed-budget gate above covers the invariant "
                           "in CI (set RUN_SLOW=1 to run)")
def test_cars_beats_session_blind_dssm(gate_data, tmp_path):
    """The full capability gate (VERDICT r1 'next round' #1): CARS must
    beat an actually-trained session-blind DSSM by a wide margin.

    CARS crosses the tie-ceiling plateau after a phase transition at
    ~300-500 steps (measured), so it trains with an early-exit loop capped
    at 1000 steps instead of the Trainer's epoch budget.
    """
    import jax

    from context_attentive_ir_tpu.models import build_model
    from context_attentive_ir_tpu.train import (
        create_train_state,
        make_iterator,
        make_train_step,
    )
    from context_attentive_ir_tpu.train.evaluate import evaluate_ranker
    from context_attentive_ir_tpu.train.steps import make_score_step

    train, test, word_dict = gate_data

    # session-blind baseline: converges to the tie ceiling in a few epochs
    dssm_cfg = default_config("dssm").replace(
        vocab_size=len(word_dict), learning_rate=5e-3, **GATE_DIMS)
    run = RunConfig(model_dir=str(tmp_path), model_name="dssm",
                    batch_size=24, test_batch_size=24, num_epochs=5,
                    early_stop=5, valid_metric="map",
                    display_iter=1000, beam_size=1, seed=7)
    tr = Trainer(dssm_cfg, run, word_dict, use_mesh=False)
    tr.fit(train, test)
    dssm_map = tr.test(test)["map"]
    assert dssm_map < 0.72, f"blind ceiling violated: {dssm_map}"

    # context-attentive model, early-exit training loop
    cfg = default_config("cars").replace(
        vocab_size=len(word_dict), learning_rate=3e-3, **GATE_DIMS)
    model = build_model(cfg)
    it = make_iterator(train, cfg, word_dict, batch_size=24, shuffle=True,
                       seed=1)
    state = create_train_state(model, cfg, next(iter(it.epoch(0))),
                               jax.random.key(1))
    step = make_train_step(model, cfg)
    score_fn = make_score_step(model, cfg)
    test_batches = list(make_iterator(test, cfg, word_dict, batch_size=24,
                                      shuffle=False, seed=0))
    rng = jax.random.key(2)
    cars_map, bar = 0.0, dssm_map + 0.15
    for epoch in range(100):
        for batch in it.epoch(epoch):
            state, m = step(state, batch, rng)
        if epoch >= 25 and (epoch % 5 == 4):
            cars_map = evaluate_ranker(score_fn, state.params,
                                       test_batches)["map"]
            if cars_map >= bar:
                break
    assert cars_map >= bar, (cars_map, dssm_map)


@pytest.mark.skipif(not __import__("os").environ.get("RUN_SLOW"),
                    reason="middle-rung ladder regression (~2 min CPU); "
                           "the RESULTS.md ladder section records the "
                           "measured tiers (set RUN_SLOW=1 to run)")
def test_mnsrf_middle_rung_slow(gate_data):
    """Ladder middle rung (VERDICT r2 next-round #2): the round-3
    rank-head fix (session-aware query product, models/multitask/
    mnsrf.py:rank_scores) lets M-NSRF transition through the blind
    ceiling on the query-keyed corpus.  Pinned to the diagnosed recipe
    (seed 4, lr 5e-3, 80 epochs -> measured best MAP 0.945; pre-fix the
    same recipe plateaus at ~0.63 forever)."""
    import jax

    from context_attentive_ir_tpu.models import build_model
    from context_attentive_ir_tpu.train import (
        create_train_state,
        make_iterator,
        make_train_step,
    )
    from context_attentive_ir_tpu.train.evaluate import evaluate_ranker
    from context_attentive_ir_tpu.train.steps import make_score_step

    train, test, word_dict = gate_data
    cfg = default_config("mnsrf").replace(
        vocab_size=len(word_dict), learning_rate=5e-3, **GATE_DIMS)
    model = build_model(cfg)
    it = make_iterator(train, cfg, word_dict, batch_size=24, shuffle=True,
                       seed=4)
    state = create_train_state(model, cfg, next(iter(it.epoch(0))),
                               jax.random.key(4))
    step = make_train_step(model, cfg)
    score_fn = make_score_step(model, cfg)
    test_batches = list(make_iterator(test, cfg, word_dict, batch_size=24,
                                      shuffle=False, seed=0))
    rng = jax.random.key(2)
    best = 0.0
    for epoch in range(80):
        for batch in it.epoch(epoch):
            state, _ = step(state, batch, rng)
        if epoch >= 59 and (epoch % 5 == 4):
            best = max(best, evaluate_ranker(score_fn, state.params,
                                             test_batches)["map"])
            if best >= 0.80:
                break
    assert best >= 0.80, best


# ---------------------------------------------------------------------------
# suggestion-discriminative (long-chain) corpus: structural properties
# (VERDICT r2 missing #1 / next-round #1)
# ---------------------------------------------------------------------------


def _long_sessions(**kw):
    from context_attentive_ir_tpu.data.synthetic import (
        generate_suggestion_sessions,
    )
    return generate_suggestion_sessions(**kw)


def test_suggestion_targets_are_bleu4_meaningful():
    """Every target (next query) has 5 tokens -> 2 valid 4-grams each; the
    round-2 corpus had 2-token targets and degenerate BLEU-4."""
    for sess in _long_sessions(n_sessions=48, seed=1):
        qs = [q["text"].split() for q in sess["query"]]
        for nxt in qs[1:]:
            assert len(nxt) == 5, nxt


def test_suggestion_crossing_is_context_dependent():
    """Identical ambiguous current queries (the all-middle window) are
    followed by divergent next queries; the divergence covers BOTH of the
    target's 4-grams, so a history-blind generator is structurally capped
    on BLEU-4 (not just BLEU-1)."""
    succ: dict[str, set[str]] = {}
    for sess in _long_sessions(n_sessions=96, seed=0):
        qs = [q["text"] for q in sess["query"]]
        for cur, nxt in zip(qs, qs[1:]):
            succ.setdefault(cur, set()).add(nxt)
    amb = {k: v for k, v in succ.items() if len(v) > 1}
    assert amb, "no context-dependent targets"
    for cur, nxts in amb.items():
        pair = sorted(nxts)
        assert len(pair) == 2
        a, b = (p.split() for p in pair)
        # first two tokens shared (middle), last three chain-specific
        assert a[:2] == b[:2] and all(x != y for x, y in zip(a[2:], b[2:]))
        grams_a = {tuple(a[i:i + 4]) for i in range(2)}
        grams_b = {tuple(b[i:i + 4]) for i in range(2)}
        assert not grams_a & grams_b, "a 4-gram survives the divergence"


def test_suggestion_chain_balance():
    """Both chains appear equally often per (group, sense, mode)."""
    from collections import Counter

    counts = Counter()
    for sess in _long_sessions(n_sessions=96, seed=0):
        q0 = sess["query"][0]["text"].split()
        prefix = q0[0]          # g{k}px / g{k}py
        counts[prefix] += 1
    by_group: dict[str, dict[str, int]] = {}
    for p, n in counts.items():
        by_group.setdefault(p[:-2], {})[p[-2:]] = n
    for g, d in by_group.items():
        assert d.get("px", 0) == d.get("py", 0), (g, d)


def test_long_corpus_ranking_still_ambiguous():
    """The ranking construction carries over: on non-keyed turns clicked
    and confuser docs overlap the query identically."""
    for sess in _long_sessions(n_sessions=24, seed=3):
        for t, q in enumerate(sess["query"]):
            qt = set(q["text"].split())
            clicked = [c for c in q["candidates"] if c["label"] == 1]
            assert len(clicked) == 1
            ov_c = len(qt & set(clicked[0]["title"].split()))
            confusers = sorted(
                (len(qt & set(c["title"].split()))
                 for c in q["candidates"] if c["label"] == 0),
                reverse=True)[:N_CONFUSERS]
            keyed = t == 0 and any("sa" in w or "sb" in w for w in qt)
            if keyed:
                assert ov_c > max(confusers)
            else:
                assert ov_c == max(confusers) == min(confusers)


def _suggestion_oracles(sessions) -> tuple[float, float]:
    """Corpus BLEU-4 of (a) the OPTIMAL history-blind generator (knows the
    chain tables, picks a fixed chain at ambiguous windows) and (b) a
    history-aware oracle (reads turn 0's prefix)."""
    from context_attentive_ir_tpu.data.synthetic import (
        _group_vocab_long,
        chain_windows,
    )
    from context_attentive_ir_tpu.eval import corpus_bleu

    chains: dict[int, dict[str, list[list[str]]]] = {}

    def windows_for(k):
        if k not in chains:
            g = _group_vocab_long(k)
            chains[k] = {c: chain_windows(g[c])
                         for c in ("chain_x", "chain_y")}
        return chains[k]

    blind_hyps, ctx_hyps, refs = [], [], []
    for sess in sessions:
        q0 = sess["query"][0]["text"].split()
        k = int(q0[0][1:].split("p")[0].replace("x", "").replace("y", ""))
        true_chain = "chain_x" if q0[0].endswith("px") else "chain_y"
        for cur_q, nxt_q in zip(sess["query"], sess["query"][1:]):
            cur = [w for w in cur_q["text"].split()
                   if "sa" not in w and "sb" not in w]
            ref = nxt_q["text"].split()
            preds = {}
            for cname, ws in windows_for(k).items():
                for i, w in enumerate(ws[:-1]):
                    if w == cur:
                        preds[cname] = ws[i + 1]
            assert preds, (cur, k)
            # blind: deterministic tie-break (always chain_x if ambiguous)
            blind_hyps.append(preds.get("chain_x") or preds["chain_y"])
            ctx_hyps.append(preds[true_chain])
            refs.append([ref])
    blind = corpus_bleu(blind_hyps, refs, max_n=4)[3]
    ctx = corpus_bleu(ctx_hyps, refs, max_n=4)[3]
    return blind, ctx


def test_suggestion_oracle_separation():
    """Even the OPTIMAL blind generator is capped well below the context
    oracle on corpus BLEU-4 -- the suggestion half of the corpus is
    discriminative by construction."""
    sessions = _long_sessions(n_sessions=192, seed=7)
    blind, ctx = _suggestion_oracles(sessions)
    assert ctx > 0.99, ctx
    assert blind < 0.87, blind
    assert ctx - blind > 0.12, (blind, ctx)


# ---------------------------------------------------------------------------
# click-keyed suggestion corpus: the chain is revealed ONLY by turn 0's
# clicked document (VERDICT r3 missing #2) -- doc-blind generators are
# structurally capped; CARS is the designed passing model.
# ---------------------------------------------------------------------------


def _click_sessions(**kw):
    from context_attentive_ir_tpu.data.synthetic import (
        generate_click_keyed_suggestion_sessions,
    )
    return generate_click_keyed_suggestion_sessions(**kw)


def _is_middle(w: str) -> bool:
    return "m" in w and "sa" not in w and "sb" not in w


def test_click_corpus_queries_hide_the_chain():
    """Every query except the final (target-only) crossing window consists
    of shared-middle words alone -- no query, and hence no query HISTORY,
    reveals the chain or the sense."""
    for sess in _click_sessions(n_sessions=96, seed=1):
        qs = [q["text"].split() for q in sess["query"]]
        for q in qs[:-1]:
            assert all(_is_middle(w) for w in q), q
        # the final query is the crossing: exactly 3 chain-suffix words
        assert sum(0 if _is_middle(w) else 1 for w in qs[-1]) == 3, qs[-1]


def test_click_corpus_turn0_click_carries_the_chain():
    """Turn 0's clicked doc carries own-chain suffix words; its confusers
    carry the OTHER chain's (identical query overlap + length), so the
    chain is decidable from the click and only from the click."""
    for sess in _click_sessions(n_sessions=48, seed=3):
        q0 = sess["query"][0]
        qt = set(q0["text"].split())
        chain_last = sess["query"][-1]["text"].split()[-1]  # e.g. g3x2
        axis = chain_last.rstrip("0123456789")              # g3x / g3y
        other = axis[:-1] + ("y" if axis.endswith("x") else "x")
        clicked = [c for c in q0["candidates"] if c["label"] == 1]
        assert len(clicked) == 1
        ct = clicked[0]["title"].split()
        assert sum(w.startswith(axis) and w[len(axis):].isdigit()
                   for w in ct) == 2, ct
        assert not any(w.startswith(other) and w[len(other):].isdigit()
                       for w in ct), ct
        ov_c = len(qt & set(ct))
        confusers = [c for c in q0["candidates"] if c["label"] == 0
                     and len(qt & set(c["title"].split())) == ov_c]
        assert len(confusers) >= N_CONFUSERS
        for c in confusers[:N_CONFUSERS]:
            toks = c["title"].split()
            assert len(toks) == len(ct)
        # later turns add NO chain words beyond the turn's own query
        # tokens (the final query IS the crossing, so its docs echo its
        # chain tokens -- visible to everyone and causally useless): the
        # chain KEY lives at turn 0's click only
        for q in sess["query"][1:]:
            q_toks = set(q["text"].split())
            for c in q["candidates"]:
                toks = set(c["title"].split()) - q_toks
                same_group = [w for w in toks
                              if w.startswith(axis[:-1])
                              and not _is_middle(w) and "s" not in w]
                assert not same_group, (q["text"], sorted(toks))


def test_click_corpus_chain_balance():
    """Both chains appear equally often per (group, sense, length)."""
    from collections import Counter

    counts = Counter()
    for sess in _click_sessions(n_sessions=96, seed=0):
        last = sess["query"][-1]["text"].split()[-1]
        axis = last.rstrip("0123456789")            # g{k}x or g{k}y
        counts[(axis[:-1], axis[-1], len(sess["query"]))] += 1
    by_key: dict[tuple, dict[str, int]] = {}
    for (g, c, t), n in counts.items():
        by_key.setdefault((g, t), {})[c] = n
    for k, d in by_key.items():
        assert d.get("x", 0) == d.get("y", 0), (k, d)


def _click_suggestion_oracles(sessions) -> tuple[float, float]:
    """Corpus BLEU-4 of (a) the OPTIMAL doc-blind generator (knows the
    chain tables, fixed tie-break at the crossing) and (b) a click-aware
    oracle that reads turn 0's clicked doc."""
    import re

    from context_attentive_ir_tpu.data.synthetic import (
        _group_vocab_click,
        chain_windows,
    )
    from context_attentive_ir_tpu.eval import corpus_bleu

    tables: dict[int, dict[str, list[list[str]]]] = {}

    def windows_for(k):
        if k not in tables:
            g = _group_vocab_click(k)
            tables[k] = {c: chain_windows(g[c])
                         for c in ("chain_x", "chain_y")}
        return tables[k]

    blind_hyps, ctx_hyps, refs = [], [], []
    for sess in sessions:
        q0 = sess["query"][0]["text"].split()
        k = int(re.match(r"g(\d+)m", q0[0]).group(1))
        clicked0 = next(c for c in sess["query"][0]["candidates"]
                        if c["label"] == 1)
        true_chain = ("chain_x" if any(
            re.match(rf"g{k}x\d+$", w)
            for w in clicked0["title"].split()) else "chain_y")
        for cur_q, nxt_q in zip(sess["query"], sess["query"][1:]):
            cur = cur_q["text"].split()
            ref = nxt_q["text"].split()
            preds = {}
            for cname, ws in windows_for(k).items():
                for i, w in enumerate(ws[:-1]):
                    if w == cur:
                        preds[cname] = ws[i + 1]
            assert preds, (cur, k)
            blind_hyps.append(preds.get("chain_x") or preds["chain_y"])
            ctx_hyps.append(preds[true_chain])
            refs.append([ref])
    blind = corpus_bleu(blind_hyps, refs, max_n=4)[3]
    ctx = corpus_bleu(ctx_hyps, refs, max_n=4)[3]
    return blind, ctx


def test_click_suggestion_oracle_separation():
    """Even the OPTIMAL doc-blind generator -- including one that reads
    the full QUERY history -- is capped well below the click-aware oracle
    on corpus BLEU-4: queries are chain-symmetric until the crossing, so
    turn 0's click is the only source of the chain bit."""
    sessions = _click_sessions(n_sessions=192, seed=7)
    blind, ctx = _click_suggestion_oracles(sessions)
    assert ctx > 0.99, ctx
    assert blind < 0.80, blind
    assert ctx - blind > 0.2, (blind, ctx)


def test_click_corpus_ranking_needs_the_click():
    """The ranking construction: on every turn the clicked doc and its
    confusers overlap the query identically (sense + chain words never
    appear in non-final queries), so ranking is solvable only via
    turn-0's click -- the corpus doubles as the click-keyed RANKING gate
    for serving (VERDICT r3 missing #1)."""
    for sess in _click_sessions(n_sessions=24, seed=5):
        for t, q in enumerate(sess["query"]):
            qt = set(q["text"].split())
            clicked = [c for c in q["candidates"] if c["label"] == 1]
            assert len(clicked) == 1
            ov_c = len(qt & set(clicked[0]["title"].split()))
            confusers = sorted(
                (len(qt & set(c["title"].split()))
                 for c in q["candidates"] if c["label"] == 0),
                reverse=True)[:N_CONFUSERS]
            assert ov_c == max(confusers) == min(confusers), (t, q["text"])


def _click_suggest_setup(with_train: bool = False):
    """The click-keyed suggestion gate's deterministic inputs:
    (cfg, word_dict, test sessions[, train sessions])."""
    from context_attentive_ir_tpu.data.synthetic import (
        generate_click_keyed_suggestion_sessions,
    )

    kw = dict(n_candidates=6, n_groups=3)
    train = [Session.from_dict(d)
             for d in generate_click_keyed_suggestion_sessions(
                 n_sessions=240, seed=0, **kw)]
    test = [Session.from_dict(d)
            for d in generate_click_keyed_suggestion_sessions(
                n_sessions=48, seed=2, **kw)]
    streams = [q.tokens for s in train for q in s.queries]
    streams += [d.tokens for s in train for q in s.queries
                for d in q.documents]
    word_dict = build_dictionary(streams)
    dims = dict(emsize=64, nhid=64, nhid_ffnn=128, nfilters=8,
                max_query_len=5, max_doc_len=9, max_session_len=3,
                num_candidates=6, dropout=0.0, dropout_emb=0.0,
                dropout_rnn=0.0)
    cfg = default_config("cars").replace(
        vocab_size=len(word_dict), learning_rate=5e-3, **dims)
    if with_train:
        return cfg, word_dict, test, train
    return cfg, word_dict, test


def _train_cars_click_suggest(epochs: int, seed: int = 1,
                              eval_every: int = 10, exit_at: float = 0.85):
    """Train CARS on the click-keyed suggestion corpus; returns
    (cfg, word_dict, best-eval params, best BLEU-4, test sessions).
    Recipe from scripts/click_gate_study.py: emsize/nhid 64 (the
    click-keyed association does not transition at gate dims 32 --
    RESULTS.md round-3 caveat), lr 5e-3, 240 train sessions; measured
    transition at epoch ~130-180 (seed 1), HRED-QS pinned at the 0.7186
    blind optimum for 60 epochs."""
    import jax

    from context_attentive_ir_tpu.models import build_model
    from context_attentive_ir_tpu.train import (
        create_train_state,
        make_iterator,
        make_train_step,
    )
    from context_attentive_ir_tpu.train.evaluate import (
        build_decode_fn,
        evaluate_suggestions,
    )

    cfg, word_dict, test, train = _click_suggest_setup(with_train=True)
    model = build_model(cfg)
    it = make_iterator(train, cfg, word_dict, batch_size=24, shuffle=True,
                       seed=seed)
    state = create_train_state(model, cfg, next(iter(it.epoch(0))),
                               jax.random.key(seed))
    step = make_train_step(model, cfg)
    decode = build_decode_fn(model, cfg, beam_size=1)
    test_batches = list(make_iterator(test, cfg, word_dict, batch_size=24,
                                      shuffle=False, seed=0))
    rng = jax.random.key(2)
    best = 0.0
    best_params = state.params
    for epoch in range(epochs):
        for batch in it.epoch(epoch):
            state, _ = step(state, batch, rng)
        if (epoch + 1) % eval_every == 0:
            m = evaluate_suggestions(decode, state.params, test_batches,
                                     word_dict)
            if m["bleu-4"] > best:
                best, best_params = m["bleu-4"], state.params
            if best >= exit_at:
                break
    return cfg, word_dict, best_params, best, test


def test_cars_click_suggestion_gate():
    """THE click-flow suggestion gate (VERDICT r3 missing #2 / weak #4):
    on the click-keyed corpus -- queries chain-symmetric until the
    crossing, chain bit ONLY in turn-0's clicked doc -- trained CARS must
    cross the doc-blind generator ceiling (corpus BLEU-4 = 0.7186, the
    analytic optimum; trained HRED-QS lands on it EXACTLY and never
    moves, scripts/click_gate_study.py) by a wide margin.  A broken
    click-flow -> decoder-init path keeps CARS at the blind optimum and
    fails here; HRED-QS cannot pass by construction, so this gate is
    CARS-specific -- the generative analogue of the ranking click gate.
    Measured transition epoch ~130-180 (study log, seed 1, best 0.9534
    at 300 epochs); budget 220 epochs with early exit.

    Wall-time budget (VERDICT r4 weak #5): the trained weights are
    disk-cached (tests/gate_cache.py); a warm run re-evaluates BLEU
    through the CURRENT model/decode code against the same threshold,
    so everything but the training dynamics is still exercised.
    RUN_SLOW=1 forces the full 220-epoch training."""
    import jax
    import jax.numpy as jnp

    from gate_cache import cached_params

    from context_attentive_ir_tpu.models import build_model
    from context_attentive_ir_tpu.train import make_iterator
    from context_attentive_ir_tpu.train.evaluate import (
        build_decode_fn,
        evaluate_suggestions,
    )

    key = dict(gate="cars_click_suggest", corpus="click_keyed_v1",
               n_train=240, n_test=48, n_candidates=6, n_groups=3,
               emsize=64, nhid=64, lr=5e-3, seed=1, epochs=220,
               exit_at=0.85)
    params = cached_params(
        key, lambda: _train_cars_click_suggest(epochs=220)[2])
    # rebuild the (deterministic) corpus + config and re-evaluate with
    # current code; params may be fresh or cached
    cfg, word_dict, test = _click_suggest_setup()
    model = build_model(cfg)
    decode = build_decode_fn(model, cfg, beam_size=1)
    test_batches = list(make_iterator(test, cfg, word_dict, batch_size=24,
                                      shuffle=False, seed=0))
    params = jax.tree.map(jnp.asarray, params)
    best = evaluate_suggestions(decode, params, test_batches,
                                word_dict)["bleu-4"]
    assert best >= 0.80, (
        f"CARS BLEU-4 {best} did not cross the doc-blind ceiling 0.7186")


def test_history_aware_suggester_beats_ablated_floor(tmp_path):
    """THE suggestion capability gate (VERDICT r2 next-round #1): on the
    long-chain corpus a history-reading generator (HRED-QS) must beat the
    history-ablated seq2seq floor by a wide BLEU-4 margin.  A broken
    session encoder/context path drops HRED-QS to the blind ceiling
    (~0.75-0.79 here) and fails this test.  Structural caps are pinned by
    test_suggestion_oracle_separation; measured on this recipe: ablated
    0.79 (= blind optimum), HRED-QS 1.00, ~40 s total on one CPU core."""
    from context_attentive_ir_tpu.data.synthetic import (
        generate_suggestion_sessions,
    )

    kw = dict(n_candidates=4, n_groups=3, min_turns=3, max_turns=3,
              modes=("query",))
    train = [Session.from_dict(d) for d in generate_suggestion_sessions(
        n_sessions=96, seed=0, **kw)]
    test = [Session.from_dict(d) for d in generate_suggestion_sessions(
        n_sessions=24, seed=2, **kw)]
    streams = [q.tokens for s in train for q in s.queries]
    word_dict = build_dictionary(streams)
    dims = dict(emsize=32, nhid=32, nhid_ffnn=64, nfilters=8,
                max_query_len=6, max_doc_len=8, max_session_len=3,
                num_candidates=4, dropout=0.0, dropout_emb=0.0,
                dropout_rnn=0.0)

    scores = {}
    for name, mtype, extra in [
            ("ablated", "seq2seq", dict(ablate_history=True)),
            ("hredqs", "hredqs", {})]:
        cfg = default_config(mtype).replace(
            vocab_size=len(word_dict), learning_rate=5e-3, **dims, **extra)
        run = RunConfig(model_dir=str(tmp_path / name), model_name=name,
                        batch_size=24, test_batch_size=24, num_epochs=30,
                        early_stop=30, valid_metric="bleu-4",
                        display_iter=1000, beam_size=1, seed=7,
                        async_checkpoint=False)
        tr = Trainer(cfg, run, word_dict, use_mesh=False)
        tr.fit(train, test)
        scores[name] = tr.test(test)["bleu-4"]

    # the floor is real (ablated learns the predictable grams)...
    assert scores["ablated"] > 0.4, scores
    # ...but capped by construction,
    assert scores["ablated"] < 0.85, scores
    # and history access buys a wide, falsifiable margin
    assert scores["hredqs"] > 0.9, scores
    assert scores["hredqs"] - scores["ablated"] >= 0.12, scores
