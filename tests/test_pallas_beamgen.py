"""Fused beam-generator kernel: exactness vs the XLA formulation.

The kernel (ops/pallas/beamgen.py) replaces [logits matmul -> logsumexp ->
lax.top_k] inside the beam step without materializing the [R, V] logits;
these tests pin (a) bit-exact parity with the XLA reference on integer
bf16 data (where the matmul is exact in f32 accumulation, so any
difference is a kernel bug, not rounding), (b) tolerance parity on random
data, (c) lax.top_k tie semantics (equal values ordered by ascending
index), and (d) END-TO-END beam_search equality between the fused step
mode and the logits mode.  Compiled-mode parity runs on-chip in bench.py's
kernel_parity harness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from context_attentive_ir_tpu.decode import beam_search
from context_attentive_ir_tpu.ops.pallas.beamgen import (
    generator_topk_lse,
    generator_topk_lse_reference,
)


def _data(rng, r, e, v, integer=False, dtype=jnp.bfloat16):
    if integer:
        x = rng.randint(-3, 4, size=(r, e)).astype(np.float32)
        t = rng.randint(-3, 4, size=(e, v)).astype(np.float32)
    else:
        x = rng.normal(size=(r, e)).astype(np.float32) * 0.5
        t = rng.normal(size=(e, v)).astype(np.float32) * 0.5
    return jnp.asarray(x, dtype), jnp.asarray(t, dtype)


@pytest.mark.parametrize("pipeline", [False, True])
def test_beamgen_bit_exact_on_integer_data(pipeline):
    rng = np.random.RandomState(0)
    x, tt = _data(rng, 70, 96, 1000, integer=True)
    v1, i1, l1 = generator_topk_lse(x, tt, 6, block_r=16, block_v=256,
                                    interpret=True, pipeline=pipeline)
    v2, i2, l2 = generator_topk_lse_reference(x, tt, 6)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-6)


@pytest.mark.parametrize("pipeline", [False, True])
def test_beamgen_random_data_close(pipeline):
    rng = np.random.RandomState(1)
    # deliberately unaligned R, E, V: exercises all three pad paths
    x, tt = _data(rng, 53, 100, 999)
    v1, i1, l1 = generator_topk_lse(x, tt, 4, block_r=16, block_v=256,
                                    interpret=True, pipeline=pipeline)
    v2, i2, l2 = generator_topk_lse_reference(x, tt, 4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
    assert (np.asarray(i1) == np.asarray(i2)).mean() > 0.99


@pytest.mark.parametrize("pipeline", [False, True])
def test_beamgen_tie_semantics_match_lax_topk(pipeline):
    """Duplicate values across vocab positions (and across tile
    boundaries): selection order must match lax.top_k (ascending index
    among equal values)."""
    x = jnp.ones((8, 8), jnp.float32)
    # columns of the table repeat, so many exact ties exist
    base = np.arange(64) % 4          # values in {0..3}, heavy ties
    tt = jnp.asarray(np.tile(base[None, :], (8, 1)), jnp.float32) / 4.0
    v1, i1, l1 = generator_topk_lse(x, tt, 7, block_r=8, block_v=16,
                                    interpret=True, pipeline=pipeline)
    v2, i2, _ = generator_topk_lse_reference(x, tt, 7)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.mark.parametrize("integer", [True, False])
def test_beamgen_prune_matches_reference(integer):
    """prune=True (threshold-pruned selection) is exact: same outputs as
    the reference on integer and random data (same cases as the serial
    kernel's parity tests)."""
    rng = np.random.RandomState(2)
    x, tt = _data(rng, 53, 96, 999, integer=integer)
    v1, i1, l1 = generator_topk_lse(x, tt, 6, block_r=16, block_v=256,
                                    interpret=True, prune=True)
    v2, i2, l2 = generator_topk_lse_reference(x, tt, 6)
    if integer:
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    else:
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-5)
        assert (np.asarray(i1) == np.asarray(i2)).mean() > 0.99
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_beamgen_prune_skipping_tiles_is_exact():
    """Concentrated logits where every tile after the first MUST prune
    (tile 0 holds every row's full top-k; later tiles are strictly
    smaller), including a later value EXACTLY EQUAL to the running kc-th
    (ties break to the lower index, so pruning it is correct): outputs
    must still match lax.top_k/logsumexp bit-for-bit on integer data."""
    r, e, v, kc = (8, 8, 64, 4)
    x = jnp.ones((r, e), jnp.float32)
    cols = np.full(v, -2.0, np.float32)   # cols[c] == logit of column c
    cols[:8] = np.array([9, 8, 7, 6, 5, 4, 3, 2], np.float32)  # tile 0 tops
    cols[17] = 6.0        # == running kc-th (6) after tile 0: must NOT
    cols[33] = -1.0       # displace the earlier index-3 entry
    tt = jnp.asarray(np.tile((cols / e)[None, :], (e, 1)), jnp.float32)
    v1, i1, l1 = generator_topk_lse(x, tt, kc, block_r=8, block_v=16,
                                    interpret=True, prune=True)
    v2, i2, l2 = generator_topk_lse_reference(x, tt, kc)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)
    assert 17 not in np.asarray(i1)  # the equal-to-kth later index lost


@pytest.mark.parametrize("prune", [False, True])
def test_beam_search_fused_step_mode_matches_logits_mode(prune):
    """Full beam_search: the fused-generator step mode must decode the
    SAME sequences and scores as the logits mode (toy linear decoder
    whose 'generator' is a tied table matmul); prune=True (threshold-
    pruned selection) must be indistinguishable."""
    rng = np.random.RandomState(3)
    B, K, V, E, T = 5, 3, 97, 32, 7
    table = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(E, E)).astype(np.float32) * 0.3)
    emb = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32) * 0.5)

    def proj_of(state, tokens):
        h = state["h"] * 0.9 + jnp.take(emb, tokens, axis=0)
        return {"h": h}, jnp.tanh(h @ w)

    def step_logits(state, tokens):
        state, p = proj_of(state, tokens)
        return state, p @ table.T

    def step_fused(state, tokens):
        state, p = proj_of(state, tokens)
        out = generator_topk_lse(p, table.T, K + 1, block_r=8,
                                 block_v=32, interpret=True, prune=prune)
        return state, out

    init = {"h": jnp.asarray(rng.normal(size=(B, E)).astype(np.float32))}
    s1, sc1 = beam_search(step_logits, init, B, T, K, min_length=2)
    s2, sc2 = beam_search(step_fused, init, B, T, K, min_length=2)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2),
                               atol=1e-5)
    # n-best too
    n1 = beam_search(step_logits, init, B, T, K, return_nbest=True)
    n2 = beam_search(step_fused, init, B, T, K, return_nbest=True)
    np.testing.assert_array_equal(np.asarray(n1[0]), np.asarray(n2[0]))
    np.testing.assert_allclose(np.asarray(n1[1]), np.asarray(n2[1]),
                               atol=1e-5)


def test_beam_search_fused_step_requires_spare_slot():
    B, K, E, V = 2, 3, 8, 64
    table_t = jnp.zeros((E, V), jnp.float32)

    def step(state, tokens):
        out = generator_topk_lse(state, table_t, K,  # K, not K+1
                                 block_r=8, block_v=32, interpret=True)
        return state, out

    with pytest.raises(ValueError, match="K\\+1"):
        beam_search(step, jnp.zeros((B, E), jnp.float32), B, 4, K)


def test_cars_decode_step_fused_matches_decode_step():
    """CARS.decode_step_fused + table matmul == decode_step logits (the
    projection split introduces no numeric change)."""
    import bench as bench_mod

    cfg, model, params, batch = bench_mod._build_cars(
        False, b=4, s=2, n=6, vocab=512)
    var = {"params": params}
    state, memory, mask = model.apply(var, batch,
                                      method=model.decode_init)
    toks = jnp.full((memory.shape[0],), 2, jnp.int32)
    st1, logits, _ = model.apply(var, state, toks, memory, mask,
                                 method=model.decode_step)
    st2, proj, _ = model.apply(var, state, toks, memory, mask,
                               method=model.decode_step_fused)
    table = params["embeddings"]["embedding"]
    re = (proj.astype(jnp.float32)
          @ table.T.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(re), np.asarray(logits,
                                                          np.float32),
                               atol=2e-2, rtol=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(st1),
                    jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_greedy_decode_fused_step_mode_matches_logits_mode():
    """greedy_decode accepts the same fused (vals, idx, lse) step contract
    as beam_search (kc=2: one spare slot covers a min_length-blocked EOS)
    and must emit identical tokens and scores."""
    from context_attentive_ir_tpu.decode import greedy_decode

    rng = np.random.RandomState(7)
    B, V, E, T = 6, 97, 32, 7
    table = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(E, E)).astype(np.float32) * 0.3)
    emb = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32) * 0.5)

    def proj_of(state, tokens):
        h = state["h"] * 0.9 + jnp.take(emb, tokens, axis=0)
        return {"h": h}, jnp.tanh(h @ w)

    def step_logits(state, tokens):
        state, p = proj_of(state, tokens)
        return state, p @ table.T

    def step_fused(state, tokens):
        state, p = proj_of(state, tokens)
        return state, generator_topk_lse(p, table.T, 2, block_r=8,
                                         block_v=32, interpret=True)

    init = {"h": jnp.asarray(rng.normal(size=(B, E)).astype(np.float32))}
    for min_len in (0, 3):
        s1, sc1 = greedy_decode(step_logits, init, B, T,
                                min_length=min_len)
        s2, sc2 = greedy_decode(step_fused, init, B, T,
                                min_length=min_len)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2),
                                   atol=1e-5)


def test_greedy_decode_fused_step_requires_two_slots():
    from context_attentive_ir_tpu.decode import greedy_decode

    def step(state, tokens):
        return state, (jnp.zeros((2, 1)), jnp.zeros((2, 1), jnp.int32),
                       jnp.zeros((2,)))

    with pytest.raises(ValueError, match="at least 2"):
        greedy_decode(step, jnp.zeros((2, 4)), 2, 4)


def test_beamgen_int8_table_bit_exact_on_integer_data():
    """int8-table mode (round 5): integer data, scales of 1 -> the
    quantized kernel must equal the float reference bit-for-bit."""
    rng = np.random.RandomState(3)
    x, _ = _data(rng, 70, 96, 1000, integer=True)
    q = rng.randint(-3, 4, size=(96, 1000)).astype(np.int8)
    scale = np.ones((1000,), np.float32)
    v1, i1, l1 = generator_topk_lse(x, jnp.asarray(q), 6, block_r=16,
                                    block_v=256, interpret=True,
                                    scale=jnp.asarray(scale))
    v2, i2, l2 = generator_topk_lse_reference(
        x, jnp.asarray(q), 6, scale=jnp.asarray(scale))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-6)


def test_beamgen_int8_table_matches_quantized_attend():
    """int8-table mode on a real quantized table: the kernel must
    reproduce scale_v * (x @ q_v) -- the exact math of the XLA quantized
    tied generator (ops/layers.Embeddings.attend) -- on unaligned dims."""
    from context_attentive_ir_tpu.ops.layers import quantize_embedding_table

    rng = np.random.RandomState(4)
    table = rng.normal(size=(999, 100)).astype(np.float32) * 0.4  # [V, E]
    q, s = quantize_embedding_table(table)
    x = jnp.asarray(rng.normal(size=(53, 100)) * 0.5, jnp.bfloat16)
    scale = jnp.asarray(s.reshape(-1))
    v1, i1, l1 = generator_topk_lse(x, jnp.asarray(q.T), 4, block_r=16,
                                    block_v=256, interpret=True,
                                    scale=scale)
    v2, i2, l2 = generator_topk_lse_reference(x, jnp.asarray(q.T), 4,
                                              scale=scale)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5,
                               rtol=1e-5)
    assert (np.asarray(i1) == np.asarray(i2)).mean() > 0.99


def test_fused_generator_table_quantized_params():
    """fused_generator_table returns the int8 (q.T, scale) pair for
    serve-quantized params and (bf16 table.T, None) for float params --
    quantized engines keep the fused beam path (round 5)."""
    from context_attentive_ir_tpu.decode.fusedgen import (
        fused_generator_table,
    )
    from context_attentive_ir_tpu.ops.layers import quantize_embedding_table

    rng = np.random.RandomState(5)
    table = rng.normal(size=(40, 16)).astype(np.float32)
    t, s = fused_generator_table({"embeddings": {"embedding": table}})
    assert s is None and t.shape == (16, 40) and t.dtype == jnp.bfloat16
    q, sc = quantize_embedding_table(table)
    t2, s2 = fused_generator_table(
        {"embeddings": {"embedding_q": jnp.asarray(q),
                        "embedding_scale": jnp.asarray(sc)}})
    assert t2.dtype == jnp.int8 and t2.shape == (16, 40)
    assert s2.shape == (40,)
    # dequantized logits match the float attend within quantization error
    x = rng.normal(size=(3, 16)).astype(np.float32)
    lq = (x @ np.asarray(t2, np.float32)) * np.asarray(s2)[None, :]
    lf = x @ table.T
    np.testing.assert_allclose(lq, lf, atol=np.abs(table).max() / 40)


def test_beam_search_int8_fused_matches_quantized_logits_mode():
    """Full beam_search with the int8-table fused step must decode the
    SAME sequences as the logits mode running the quantized generator
    math (scale_v * (p @ q_v)) -- the serve path for quantized engines."""
    from context_attentive_ir_tpu.ops.layers import quantize_embedding_table

    rng = np.random.RandomState(6)
    B, K, V, E, T = 5, 3, 97, 32, 7
    table = rng.normal(size=(V, E)).astype(np.float32)
    q, s = quantize_embedding_table(table)
    qt = jnp.asarray(q.T)
    scale = jnp.asarray(s.reshape(-1))
    w = jnp.asarray(rng.normal(size=(E, E)).astype(np.float32) * 0.3)
    emb = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32) * 0.5)

    def proj_of(state, tokens):
        h = state["h"] * 0.9 + jnp.take(emb, tokens, axis=0)
        return {"h": h}, jnp.tanh(h @ w)

    def step_logits(state, tokens):
        state, p = proj_of(state, tokens)
        logits = jnp.dot(p.astype(jnp.bfloat16), qt.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return state, logits * scale[None, :]

    def step_fused(state, tokens):
        state, p = proj_of(state, tokens)
        out = generator_topk_lse(p.astype(jnp.bfloat16), qt, K + 1,
                                 block_r=8, block_v=32, interpret=True,
                                 scale=scale)
        return state, out

    init = {"h": jnp.asarray(rng.normal(size=(B, E)).astype(np.float32))}
    s1, sc1 = beam_search(step_logits, init, B, T, K, min_length=2)
    s2, sc2 = beam_search(step_fused, init, B, T, K, min_length=2)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2),
                               atol=1e-5)
