"""Beam search / greedy decode unit tests on hand-crafted step functions."""

import jax
import jax.numpy as jnp
import numpy as np

from context_attentive_ir_tpu.constants import BOS, EOS, PAD
from context_attentive_ir_tpu.decode import beam_search, greedy_decode

V = 6  # vocab: 0=PAD 1=UNK 2=BOS 3=EOS 4=a 5=b


def make_step(table):
    """step_fn from a dict mapping current token -> logprob row."""
    logp = jnp.log(jnp.asarray(table))

    def step(state, tokens):
        return state, logp[tokens]

    return step


def test_greedy_follows_argmax_and_stops_at_eos():
    # from BOS: 'a' most likely; from 'a': 'b'; from 'b': EOS
    table = np.full((V, V), 1e-9, np.float32)
    table[BOS, 4] = 0.9
    table[4, 5] = 0.8
    table[5, EOS] = 0.95
    table[EOS, EOS] = 1.0
    table /= table.sum(-1, keepdims=True)
    step = make_step(table)
    toks, score = jax.jit(
        lambda: greedy_decode(step, (), 2, 6))()
    toks = np.asarray(toks)
    np.testing.assert_array_equal(toks[0], [4, 5, EOS, PAD, PAD, PAD])
    assert np.isfinite(np.asarray(score)).all()


def test_beam_finds_higher_probability_path_than_greedy():
    """Classic beam case: greedy takes a locally-best token leading to a
    low-probability continuation; beam recovers the globally better path."""
    table = np.full((V, V), 1e-9, np.float32)
    # from BOS: 'a'=0.51, 'b'=0.49 (greedy picks 'a')
    table[BOS, 4] = 0.51
    table[BOS, 5] = 0.49
    # from 'a': everything bad (uniform), from 'b': EOS = 0.99
    table[4, :] = 0.2
    table[5, EOS] = 0.99
    table[EOS, EOS] = 1.0
    table /= table.sum(-1, keepdims=True)
    step = make_step(table)
    g_toks, _ = greedy_decode(step, (), 1, 4)
    b_toks, b_score = beam_search(step, (), 1, 4, beam_size=3, alpha=0.0)
    assert np.asarray(g_toks)[0, 0] == 4
    assert np.asarray(b_toks)[0, 0] == 5       # beam prefers b -> EOS
    assert np.asarray(b_toks)[0, 1] == EOS


def test_chunked_topk_exactness():
    """`_topk_rows('chunked')` must equal the plain top_k bit-for-bit
    (it is the default-dispatched beam formulation on TPU, PERF.md r3)."""
    from context_attentive_ir_tpu.decode.beam import (_chunk_count,
                                                      _topk_rows)
    rng = np.random.RandomState(7)
    scores = jnp.asarray(rng.normal(size=(37, 2048)).astype(np.float32))
    assert _chunk_count(2048, 6) > 0          # chunking actually active
    te, ie = _topk_rows(scores, 6, "exact")
    tc, ic = _topk_rows(scores, 6, "chunked")
    np.testing.assert_array_equal(np.asarray(te), np.asarray(tc))
    np.testing.assert_array_equal(np.asarray(ie), np.asarray(ic))
    # tiny vocab falls back to exact instead of producing short chunks
    assert _chunk_count(V, 6) == 0


def test_beam_topk_methods_agree_end_to_end():
    """beam_search output is identical under exact vs chunked top-k on a
    random step function with a chunkable vocab."""
    vv = 96                                    # _chunk_count(96, 6) == 4
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.normal(size=(vv, vv)).astype(np.float32))

    def step(state, tokens):
        return state, logits[tokens]

    te, se = beam_search(step, (), 4, 6, beam_size=5, topk_method="exact")
    tc, sc = beam_search(step, (), 4, 6, beam_size=5,
                         topk_method="chunked")
    np.testing.assert_array_equal(np.asarray(te), np.asarray(tc))
    np.testing.assert_allclose(np.asarray(se), np.asarray(sc), rtol=1e-6)


def test_beam_topk_approx_path_runs():
    """The opt-in ``approx`` method (TPU approx_max_k) must at least
    trace/compile and produce well-formed beams (on CPU the primitive
    reduces to exact top-k, so outputs match the exact beam here)."""
    vv = 96
    rng = np.random.RandomState(5)
    logits = jnp.asarray(rng.normal(size=(vv, vv)).astype(np.float32))

    def step(state, tokens):
        return state, logits[tokens]

    ta, sa = beam_search(step, (), 4, 6, beam_size=5, topk_method="approx")
    te, se = beam_search(step, (), 4, 6, beam_size=5, topk_method="exact")
    assert ta.shape == te.shape and sa.shape == se.shape
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(te))


def test_topk_auto_dispatch(monkeypatch, tmp_path):
    """``auto`` resolves via the measured dispatch table on TPU and falls
    back to exact on CPU / for unmeasured shapes (both choices are
    bit-exact, so this only pins the dispatch policy)."""
    from context_attentive_ir_tpu.decode import beam
    from context_attentive_ir_tpu.ops import dispatch

    # CPU backend -> always exact, regardless of table
    assert beam._resolve_topk_method("auto", 50_000, 6) == "exact"
    # forced methods pass through untouched
    assert beam._resolve_topk_method("chunked", 50_000, 6) == "chunked"

    monkeypatch.setattr(beam.jax, "default_backend", lambda: "tpu")
    # TPU backend, no measured beam rows -> exact
    assert beam._resolve_topk_method("auto", 50_000, 6) == "exact"

    monkeypatch.setattr(dispatch, "TABLE_PATH", tmp_path / "t.json")
    try:
        dispatch.write_table([
            dict(kind="beam_topk", v=50_000, kc=6,
                 exact_ms=2.0, chunked_ms=1.0),
            dict(kind="beam_topk", v=50_000, kc=4,
                 exact_ms=1.0, chunked_ms=2.0),
        ])
        assert beam._resolve_topk_method("auto", 50_000, 6) == "chunked"
        # nearest vocab in log distance at exact kc match
        assert beam._resolve_topk_method("auto", 40_000, 6) == "chunked"
        # measured slower -> exact
        assert beam._resolve_topk_method("auto", 50_000, 4) == "exact"
        # no kc match -> exact
        assert beam._resolve_topk_method("auto", 50_000, 5) == "exact"
    finally:
        dispatch.reload_table()


def test_beam_size_one_matches_greedy():
    rng = np.random.RandomState(0)
    table = rng.rand(V, V).astype(np.float32) + 1e-3
    table /= table.sum(-1, keepdims=True)
    step = make_step(table)
    g_toks, _ = greedy_decode(step, (), 3, 5)
    b_toks, _ = beam_search(step, (), 3, 5, beam_size=1, alpha=0.0)
    np.testing.assert_array_equal(np.asarray(g_toks), np.asarray(b_toks))


def test_beam_state_gather_consistency():
    """Step function whose state counts steps per beam; after search the
    state must have been gathered consistently (no cross-batch mixing)."""
    rng = np.random.RandomState(1)
    table = rng.rand(V, V).astype(np.float32)
    table /= table.sum(-1, keepdims=True)
    logp = jnp.log(jnp.asarray(table))

    def step(state, tokens):
        # state: per-row last token; verify it matches what beam fed us
        return tokens, logp[tokens]

    toks, score = beam_search(step, jnp.zeros((2,), jnp.int32), 2, 4,
                              beam_size=2)
    assert np.asarray(toks).shape == (2, 4)
    assert np.isfinite(np.asarray(score)).all()


def test_finished_beams_frozen():
    """Once EOS is emitted the hypothesis must not grow (PAD-only)."""
    table = np.full((V, V), 1e-9, np.float32)
    table[BOS, EOS] = 0.99     # immediately finish
    table[EOS, 4] = 0.99       # tempting continuation (must be ignored)
    table /= table.sum(-1, keepdims=True)
    step = make_step(table)
    toks, _ = beam_search(step, (), 1, 5, beam_size=2)
    t = np.asarray(toks)[0]
    assert t[0] == EOS or t[0] == PAD
    assert (t[1:] == PAD).all()


def test_min_length_blocks_early_eos():
    """min_length forbids EOS until that many tokens were emitted."""
    table = np.full((V, V), 1e-9, np.float32)
    table[BOS, EOS] = 0.9      # wants to stop immediately
    table[BOS, 4] = 0.1
    table[4, EOS] = 0.6
    table[4, 5] = 0.4
    table[5, EOS] = 0.9
    table[EOS, EOS] = 1.0
    table /= table.sum(-1, keepdims=True)
    step = make_step(table)
    toks0, _ = beam_search(step, (), 1, 5, beam_size=2, min_length=0)
    toks2, _ = beam_search(step, (), 1, 5, beam_size=2, min_length=2)
    assert np.asarray(toks0)[0, 0] == EOS
    t = np.asarray(toks2)[0]
    assert t[0] != EOS and t[1] != EOS     # two real tokens first
    assert EOS in t.tolist()


def test_length_penalty_variants():
    from context_attentive_ir_tpu.decode.penalties import (
        length_average,
        length_none,
        length_wu,
    )

    lens = jnp.asarray([1, 5, 10])
    np.testing.assert_allclose(np.asarray(length_none(lens)), [1, 1, 1])
    np.testing.assert_allclose(np.asarray(length_average(lens)),
                               [1, 5, 10])
    np.testing.assert_allclose(np.asarray(length_wu(lens, 1.0)),
                               [1.0, 10 / 6, 15 / 6], rtol=1e-6)
    # alpha=0 -> no normalization
    np.testing.assert_allclose(np.asarray(length_wu(lens, 0.0)), [1, 1, 1])


def test_coverage_penalty_values():
    from context_attentive_ir_tpu.decode.penalties import (
        coverage_summary,
        coverage_wu,
    )

    cov = jnp.asarray([[1.0, 0.5, 2.0]])
    mask = jnp.asarray([[True, True, False]])  # last position is padding
    # wu: beta * (log min(1,1) + log min(.5,1)) = beta * log(0.5)
    np.testing.assert_allclose(np.asarray(coverage_wu(cov, mask, 2.0)),
                               [2.0 * np.log(0.5)], rtol=1e-6)
    # summary: -beta * ((max(1,1) + max(.5,1)) - 2) = 0
    np.testing.assert_allclose(
        np.asarray(coverage_summary(cov, mask, 2.0)), [0.0], atol=1e-6)
    cov2 = jnp.asarray([[1.5, 1.0, 9.0]])
    np.testing.assert_allclose(
        np.asarray(coverage_summary(cov2, mask, 2.0)), [-1.0], rtol=1e-6)


def test_beam_coverage_reranks():
    """With attention exposed, the coverage penalty demotes hypotheses
    that ignore source positions."""
    table = np.full((V, V), 1e-9, np.float32)
    # two near-equal paths: a->EOS and b->EOS
    table[BOS, 4] = 0.51
    table[BOS, 5] = 0.49
    table[4, EOS] = 0.9
    table[5, EOS] = 0.9
    table[EOS, EOS] = 1.0
    table /= table.sum(-1, keepdims=True)
    logp = jnp.log(jnp.asarray(table))
    L = 3

    def step(state, tokens):
        # token 'a' attends only position 0; 'b' spreads attention
        focused = jnp.asarray([1.0, 0.0, 0.0])
        spread = jnp.asarray([1 / 3, 1 / 3, 1 / 3])
        attn = jnp.where((tokens == 4)[:, None], focused, spread)
        return state, logp[tokens], attn

    cov_mask = jnp.ones((1, L), bool)
    t0, _ = beam_search(step, (), 1, 4, beam_size=3, alpha=0.0,
                        coverage_beta=0.0, cov_mask=cov_mask)
    t1, _ = beam_search(step, (), 1, 4, beam_size=3, alpha=0.0,
                        coverage_beta=5.0, cov_mask=cov_mask)
    assert np.asarray(t0)[0, 0] == 4   # raw logprob prefers 'a'
    assert np.asarray(t1)[0, 0] == 5   # coverage prefers spread attention


def test_iter_topk_matches_lax_topk():
    """The sort-free merge must reproduce lax.top_k values, indices (tie
    semantics: lowest index first), and carry the winning lane's payload
    -- including inputs with lanes BELOW the finite NEG_INF sentinel,
    where a value-overwrite retirement (instead of the taken mask) would
    re-pick retired lanes and emit duplicate indices."""
    from context_attentive_ir_tpu.decode.beam import _iter_topk

    rng = np.random.RandomState(7)
    for trial in range(20):
        b, c = rng.randint(1, 6), rng.randint(5, 40)
        k = min(rng.randint(1, 6), c)
        x = rng.randn(b, c).astype(np.float32)
        if trial % 3 == 0:
            x = np.round(x) + 0.0           # heavy exact ties
        if trial % 4 == 0:
            x[rng.rand(b, c) < 0.5] = -1e9  # NEG_INF-valued lanes
        if trial % 5 == 0:
            x[rng.rand(b, c) < 0.3] = -2e9  # below the sentinel
        pay = rng.randint(0, 1000, (b, c)).astype(np.int32)
        v, i, p = _iter_topk(jnp.asarray(x), jnp.asarray(pay), k)
        rv, ri = jax.lax.top_k(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_array_equal(
            np.asarray(p), pay[np.arange(b)[:, None], np.asarray(ri)])


def test_select_slots_matches_gather():
    """One-hot select+sum beam reorder == advanced-index gather, for
    float / int / bool leaves and trailing dims 0..2."""
    from context_attentive_ir_tpu.decode.beam import _select_slots

    rng = np.random.RandomState(3)
    for shape in [(4, 5), (3, 4, 7), (2, 3, 4, 2)]:
        parent = rng.randint(0, shape[1], shape[:2]).astype(np.int32)
        for dtype in (np.float32, np.int32, bool):
            x = (rng.randn(*shape) * 10).astype(dtype)
            got = np.asarray(
                _select_slots(jnp.asarray(x), jnp.asarray(parent)))
            want = x[np.arange(shape[0])[:, None], parent]
            assert got.dtype == want.dtype
            np.testing.assert_array_equal(got, want)


def test_beam_bookkeeping_modes_agree_end_to_end():
    """``legacy`` (lax.top_k merge + row gathers + carried sequence
    buffer) and ``fused`` (iterative merge + one-hot selects +
    backpointer reconstruction) bookkeeping must produce bit-identical
    beams across n-best, min_length, coverage, and fused-generator-step
    modes (PERF.md r4 #7: the fused form is the measured-faster on-chip
    dispatch, so it gets the same exactness guarantee as the top-k and
    generator dispatches)."""
    rng = np.random.RandomState(11)
    H, vv = 8, 32
    Wt = jnp.asarray(rng.randn(vv, H).astype(np.float32))
    Wh = jnp.asarray(rng.randn(H, H).astype(np.float32))
    emb = jnp.asarray(rng.randn(vv, H).astype(np.float32))

    def step(state, tok):
        h = jnp.tanh(state @ Wh + emb[tok])
        return h, h @ Wt.T

    def step_attn(state, tok):
        h = jnp.tanh(state @ Wh + emb[tok])
        return h, h @ Wt.T, jax.nn.softmax(h[:, :4])

    def step_topk(state, tok):
        h = jnp.tanh(state @ Wh + emb[tok])
        logits = h @ Wt.T
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        t1, i1 = jax.lax.top_k(logits, 6)
        return h, (t1, i1, lse)

    cases = [
        (step, dict(beam_size=5)),
        (step, dict(beam_size=3, return_nbest=True, min_length=2)),
        (step_attn, dict(beam_size=4, coverage_beta=0.3,
                         return_nbest=True)),
        (step_topk, dict(beam_size=5, return_nbest=True)),
    ]
    for fn, kw in cases:
        init = jnp.asarray(rng.randn(3, H).astype(np.float32))
        a = beam_search(fn, init, 3, 6, bookkeeping="legacy", **kw)
        b = beam_search(fn, init, 3, 6, bookkeeping="fused", **kw)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bookkeeping_auto_dispatch(monkeypatch, tmp_path):
    """``auto`` resolves via measured ``beam_bk`` table rows on TPU and
    falls back to legacy on CPU / for unmeasured shapes (both modes are
    bit-exact, so this only pins the dispatch policy)."""
    from context_attentive_ir_tpu.decode import beam
    from context_attentive_ir_tpu.ops import dispatch

    # CPU backend -> legacy, regardless of table
    assert beam._resolve_bookkeeping("auto", 1600, 5) == "legacy"
    # forced methods pass through untouched
    assert beam._resolve_bookkeeping("fused", 1600, 5) == "fused"

    monkeypatch.setattr(beam.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(dispatch, "TABLE_PATH", tmp_path / "t.json")
    try:
        # TPU backend, no measured beam_bk rows -> legacy (the SHIPPED
        # table has measured rows, so point at an empty one first)
        dispatch.write_table([])
        assert beam._resolve_bookkeeping("auto", 1600, 5) == "legacy"

        dispatch.write_table([
            dict(kind="beam_bk", rows=1600, k=5,
                 fused_ms=1.0, legacy_ms=2.0),
            dict(kind="beam_bk", rows=320, k=2,
                 fused_ms=2.0, legacy_ms=1.0),
        ])
        assert beam._resolve_bookkeeping("auto", 1600, 5) == "fused"
        # nearest rows in log distance at exact k match
        assert beam._resolve_bookkeeping("auto", 3000, 5) == "fused"
        # measured slower -> legacy
        assert beam._resolve_bookkeeping("auto", 320, 2) == "legacy"
        # no k match -> legacy
        assert beam._resolve_bookkeeping("auto", 1600, 3) == "legacy"
    finally:
        dispatch.reload_table()


def test_early_exit_is_bit_exact():
    """``early_exit=True`` must reproduce the full-budget decode
    bit-for-bit.  The skip fires only when EVERY beam of EVERY row is
    finished, and an all-finished step is provably the identity the
    frozen branch emits (beam totals are sorted descending after every
    merge, so parent == arange with PAD continuations) -- exercised here
    with a chain that finishes at step 3 of a 12-step budget, across
    both bookkeeping modes, n-best, min_length, coverage, and the
    fused-generator step contract, plus greedy."""
    table = np.full((V, V), 1e-9, np.float32)
    table[BOS, 4] = 0.6
    table[BOS, 5] = 0.4
    table[4, 5] = 0.8
    table[5, EOS] = 0.95
    table[EOS, EOS] = 1.0
    table /= table.sum(-1, keepdims=True)
    step = make_step(table)
    logp = jnp.log(jnp.asarray(table))

    def step_attn(state, tokens):
        attn = jax.nn.one_hot(tokens % 3, 3)
        return state, logp[tokens], attn

    def step_topk(state, tokens):
        row = logp[tokens]
        lse = jax.scipy.special.logsumexp(row, axis=-1)
        t1, i1 = jax.lax.top_k(row, 4)
        return state, (t1, i1, lse)

    cases = [
        (step, dict(beam_size=3)),
        (step, dict(beam_size=3, bookkeeping="legacy")),
        (step, dict(beam_size=3, bookkeeping="fused", return_nbest=True)),
        (step, dict(beam_size=2, min_length=2)),
        (step_attn, dict(beam_size=2, coverage_beta=0.5,
                         cov_mask=jnp.ones((3, 3), bool))),
        (step_topk, dict(beam_size=3, return_nbest=True)),
    ]
    for fn, kw in cases:
        a = beam_search(fn, (), 3, 12, early_exit=True, **kw)
        b = beam_search(fn, (), 3, 12, early_exit=False, **kw)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    for fn in (step, step_topk):
        g1 = greedy_decode(fn, (), 3, 12, early_exit=True)
        g0 = greedy_decode(fn, (), 3, 12, early_exit=False)
        np.testing.assert_array_equal(np.asarray(g1[0]), np.asarray(g0[0]))
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]))

    # jit-compiles with the cond in place (the serving path always jits)
    toks, _ = jax.jit(lambda: beam_search(step, (), 2, 12, beam_size=2))()
    assert np.asarray(toks).shape == (2, 12)


def test_early_exit_skips_the_step_function():
    """Once all rows are finished the remaining scan steps must NOT run
    the step function.  Detected with a step that poisons its own state
    with NaN every call and returns state-dependent scores: under
    early_exit the decode is clean, without it the trailing steps would
    still be finished-masked (outputs equal) -- so assert instead via an
    eager side-effect counter through ``io_callback``."""
    import functools

    calls = {"n": 0}

    def bump():
        calls["n"] += 1
        return np.int32(0)

    table = np.full((V, V), 1e-9, np.float32)
    table[:, EOS] = 0.99        # EVERY continuation finishes (so both
    table /= table.sum(-1, keepdims=True)   # beams of both rows do)
    logp = jnp.log(jnp.asarray(table))

    def step(state, tokens):
        tick = jax.experimental.io_callback(
            bump, jax.ShapeDtypeStruct((), jnp.int32), ordered=True)
        return state + tick, logp[tokens] + tick.astype(jnp.float32)

    run = functools.partial(beam_search, step, jnp.zeros((2,), jnp.int32),
                            2, 8, beam_size=2)
    calls["n"] = 0
    run(early_exit=False)
    full = calls["n"]
    calls["n"] = 0
    run(early_exit=True)
    skipped = calls["n"]
    # probe + step 1 (EOS) + step 2 (all-finished discovered after the
    # merge of step 2's inputs... the predicate reads the carry, so the
    # first skippable step is the one AFTER finished became all-true)
    assert full >= 8                      # every budget step ran
    assert skipped <= 3, (skipped, full)  # probe + ~2 live steps


# -- candidate-shortlist decoding (round 5, VERDICT r4 weak #3) ---------


def test_build_shortlist_contents():
    from context_attentive_ir_tpu.constants import BOS, EOS, PAD, UNK
    from context_attentive_ir_tpu.decode.shortlist import build_shortlist

    sl = build_shortlist(10, 100, source_ids=[[55, 90], [7, 55]])
    assert sl.dtype == np.int32
    assert list(sl) == sorted(set(sl))          # sorted unique
    for t in (PAD, UNK, BOS, EOS, 55, 90, 7):
        assert t in sl
    assert len(sl) == 10                        # filled to size
    # fill uses the LOWEST free ids (frequency-ranked by construction)
    assert 4 in sl and 5 in sl and 6 in sl
    # size > vocab clamps
    assert len(build_shortlist(500, 30)) == 30
    # overflow drops the rarest (highest) source ids, keeps specials
    sl2 = build_shortlist(6, 100, source_ids=list(range(4, 50)))
    assert len(sl2) == 6
    assert all(t in sl2 for t in (PAD, UNK, BOS, EOS))
    assert list(sl2[4:]) == [4, 5]
    # out-of-range source ids are ignored
    sl3 = build_shortlist(5, 20, source_ids=[-3, 19, 25])
    assert 19 in sl3 and len(sl3) == 5


def test_shortlist_xla_step_full_coverage_matches_exact():
    """A shortlist covering the whole vocab reproduces the exact beam
    decode (the restricted softmax equals the full softmax)."""
    from context_attentive_ir_tpu.decode.shortlist import build_shortlist

    import bench as bench_mod
    from context_attentive_ir_tpu.decode import beam_search
    from context_attentive_ir_tpu.decode.fusedgen import (
        make_shortlist_xla_step,
    )

    cfg, model, params, batch = bench_mod._build_cars(
        False, b=4, s=2, n=6, vocab=512)
    var = {"params": params}
    state, memory, mask = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, method=model.decode_init))(params, batch)
    rows = memory.shape[0]
    K = 3
    rep = lambda x: jnp.repeat(x, K, axis=0)
    mem_k, mask_k = rep(memory), rep(mask)

    step_exact = lambda st, toks: model.apply(
        var, st, toks, mem_k, mask_k, method=model.decode_step)
    sl = build_shortlist(512, 512)
    step_sl = make_shortlist_xla_step(model, var, params, mem_k, mask_k,
                                      kc=K + 1, shortlist=jnp.asarray(sl))
    s1, sc1 = beam_search(step_exact, state, rows, 6, K)
    s2, sc2 = beam_search(step_sl, state, rows, 6, K)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2),
                               atol=2e-3, rtol=2e-3)


def test_shortlist_xla_step_restricts_tokens():
    """A restricted shortlist decodes ONLY shortlist tokens (plus PAD),
    and the returned scores are log-probs over the shortlist support."""
    from context_attentive_ir_tpu.constants import PAD
    from context_attentive_ir_tpu.decode import beam_search
    from context_attentive_ir_tpu.decode.fusedgen import (
        make_shortlist_xla_step,
    )
    from context_attentive_ir_tpu.decode.shortlist import build_shortlist

    import bench as bench_mod

    cfg, model, params, batch = bench_mod._build_cars(
        False, b=4, s=2, n=6, vocab=512)
    var = {"params": params}
    state, memory, mask = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, method=model.decode_init))(params, batch)
    rows = memory.shape[0]
    K = 2
    rep = lambda x: jnp.repeat(x, K, axis=0)
    sl = build_shortlist(64, 512, source_ids=np.asarray(batch.query))
    step = make_shortlist_xla_step(model, var, params, rep(memory),
                                   rep(mask), kc=K + 1,
                                   shortlist=jnp.asarray(sl))
    seqs, _ = beam_search(step, state, rows, 6, K)
    toks = set(np.asarray(seqs).reshape(-1).tolist())
    assert toks <= (set(sl.tolist()) | {PAD}), toks - set(sl.tolist())
