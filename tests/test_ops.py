"""Unit tests for masking, attention, decoder, and small layers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from context_attentive_ir_tpu.ops import (
    AttentionPool,
    AttnLSTMDecoder,
    CharCNN,
    Embeddings,
    GlobalAttention,
    Highway,
    Maxout,
    MLP,
    cosine_similarity,
    masked_mean,
    masked_softmax,
    sequence_mask,
)


def test_sequence_mask():
    m = sequence_mask(jnp.array([0, 2, 4]), 4)
    expect = np.array([[0, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1]], bool)
    np.testing.assert_array_equal(np.asarray(m), expect)


def test_masked_softmax_rows():
    logits = jnp.array([[1.0, 2.0, 3.0], [5.0, 1.0, 1.0]])
    mask = jnp.array([[True, True, False], [False, False, False]])
    p = np.asarray(masked_softmax(logits, mask))
    np.testing.assert_allclose(p[0, :2].sum(), 1.0, atol=1e-6)
    assert p[0, 2] == 0.0
    np.testing.assert_allclose(p[1], 0.0)  # fully masked row -> zeros, no NaN


def test_masked_mean():
    x = jnp.arange(12, dtype=jnp.float32).reshape(2, 3, 2)
    mask = jnp.array([[True, True, False], [True, False, False]])
    out = np.asarray(masked_mean(x, mask))
    np.testing.assert_allclose(out[0], [1.0, 2.0])
    np.testing.assert_allclose(out[1], [6.0, 7.0])


@pytest.mark.parametrize("attn_type", ["dot", "general", "mlp"])
def test_global_attention_shapes_and_masking(attn_type):
    B, Tq, S, H = 2, 3, 5, 8
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.normal(size=(B, Tq, H)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(B, S, H)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool))
    mod = GlobalAttention(dim=H, attn_type=attn_type)
    params = mod.init(jax.random.key(0), q, mem, mask)
    out, align = mod.apply(params, q, mem, mask)
    assert out.shape == (B, Tq, H)
    assert align.shape == (B, Tq, S)
    a = np.asarray(align)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)
    assert np.all(a[0, :, 3:] == 0.0)
    # rank-2 query path
    out2, align2 = mod.apply(params, q[:, 0], mem, mask)
    assert out2.shape == (B, H)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out[:, 0]),
                               atol=1e-6)


def test_attention_pool():
    B, T, H = 3, 6, 8
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, T) > 0.3)
    mask = mask.at[:, 0].set(True)
    mod = AttentionPool(dim=H)
    params = mod.init(jax.random.key(0), x, mask)
    out = mod.apply(params, x, mask)
    assert out.shape == (B, H)
    # query-conditioned
    q = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    out_q = mod.apply(params, x, mask, q)
    assert out_q.shape == (B, H)


def test_embeddings_fixed_stops_gradient():
    table = np.random.RandomState(0).normal(size=(10, 4)).astype(np.float32)
    mod = Embeddings(vocab_size=10, features=4, pretrained=table, fixed=True)
    ids = jnp.array([[1, 2], [3, 4]])
    params = mod.init(jax.random.key(0), ids)
    np.testing.assert_allclose(
        np.asarray(params["params"]["embedding"]), table)

    def loss(p):
        return jnp.sum(mod.apply(p, ids) ** 2)

    grads = jax.grad(loss)(params)
    np.testing.assert_allclose(
        np.asarray(grads["params"]["embedding"]), 0.0)


def test_highway_maxout_mlp_charcnn_shapes():
    x = jnp.ones((2, 5, 16))
    hw = Highway(num_layers=2)
    p = hw.init(jax.random.key(0), x)
    assert hw.apply(p, x).shape == x.shape

    mx = Maxout(features=8, pool_size=3)
    p = mx.init(jax.random.key(0), x)
    assert mx.apply(p, x).shape == (2, 5, 8)

    mlp = MLP(layer_sizes=(32, 1), final_activation=False)
    p = mlp.init(jax.random.key(0), x)
    assert mlp.apply(p, x).shape == (2, 5, 1)

    chars = jnp.ones((2, 5, 9), jnp.int32)
    cc = CharCNN(char_vocab=260, num_filters=8)
    p = cc.init(jax.random.key(0), chars)
    assert cc.apply(p, chars).shape == (2, 5, 24)


def test_cosine_similarity():
    a = jnp.array([[1.0, 0.0], [1.0, 1.0]])
    b = jnp.array([[1.0, 0.0], [-1.0, -1.0]])
    np.testing.assert_allclose(np.asarray(cosine_similarity(a, b)),
                               [1.0, -1.0], atol=1e-6)


def test_decoder_teacher_forcing_and_step_agree():
    B, T, S, H, E, V = 2, 4, 5, 8, 6, 20
    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.normal(size=(B, T, E)).astype(np.float32))
    mem = jnp.asarray(rng.normal(size=(B, S, H)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, S), bool))
    dec = AttnLSTMDecoder(features=H, embed_dim=E)
    params = dec.init(jax.random.key(0), emb, mem, mask)
    outs, aligns = dec.apply(params, emb, mem, mask)
    assert outs.shape == (B, T, H)
    assert aligns.shape == (B, T, S)

    # manual stepping must reproduce the scan
    def manual(params):
        state = dec.apply(params, B, method=dec.init_state)
        collected = []
        for t in range(T):
            state, h, _ = dec.apply(params, state, emb[:, t], mem, mask,
                                    method=dec.step)
            collected.append(h)
        return jnp.stack(collected, axis=1)

    np.testing.assert_allclose(np.asarray(manual(params)), np.asarray(outs),
                               atol=1e-5)
    del V


def test_embeddings_lookup_padded_exact():
    """Lane-padded lookup (E=300 -> 384) == plain lookup + zero tail, and
    an RNNLayer fed the padded rows with in_features=300 matches the
    unpadded path exactly (ops/layers.Embeddings.lookup_padded)."""
    import jax

    from context_attentive_ir_tpu.ops.layers import Embeddings
    from context_attentive_ir_tpu.ops.rnn import RNNLayer

    rng = np.random.RandomState(0)
    V, E, B, T, H = 50, 300, 4, 5, 128
    ids = jnp.asarray(rng.randint(0, V, size=(B, T)), jnp.int32)
    emb = Embeddings(V, E)
    p = emb.init(jax.random.key(0), ids)
    plain = emb.apply(p, ids)
    padded = emb.apply(p, ids, method=Embeddings.lookup_padded)
    assert padded.shape == (B, T, 384)
    np.testing.assert_allclose(np.asarray(padded[..., :E]),
                               np.asarray(plain), atol=0)
    assert np.all(np.asarray(padded[..., E:]) == 0)

    mask = jnp.asarray(np.ones((B, T), bool))
    layer = RNNLayer(features=H)
    layer_p = RNNLayer(features=H, in_features=E)
    params = layer.init(jax.random.key(1), plain, mask)
    out_plain, fin_plain = layer.apply(params, plain, mask)
    out_pad, fin_pad = layer_p.apply(params, padded, mask)
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out_plain),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fin_pad), np.asarray(fin_plain),
                               atol=1e-6)


def test_bilstm_merged_scan_matches_per_direction():
    """The merged-direction scan (one lax.scan for both BiLSTM directions)
    must equal two independent lstm_scan passes with the same params."""
    from context_attentive_ir_tpu.ops.rnn import bilstm_scan, lstm_scan

    rng = np.random.RandomState(3)
    B, T, H = 6, 9, 16
    xp_f = jnp.asarray(rng.normal(size=(B, T, 4 * H)).astype(np.float32))
    xp_b = jnp.asarray(rng.normal(size=(B, T, 4 * H)).astype(np.float32))
    w_f = jnp.asarray((rng.normal(size=(H, 4 * H)) * 0.3).astype(np.float32))
    w_b = jnp.asarray((rng.normal(size=(H, 4 * H)) * 0.3).astype(np.float32))
    lens = rng.randint(1, T + 1, size=(B,))
    lens[0] = T
    mask = jnp.asarray(np.arange(T)[None, :] < lens[:, None])

    zero = jnp.zeros((B, H), jnp.float32)
    ref_f, (hT_f, _) = lstm_scan(xp_f, mask, w_f, zero, zero)
    ref_b, (hT_b, _) = lstm_scan(xp_b, mask, w_b, zero, zero,
                                 reverse=True)
    out_f, out_b, mT_f, mT_b = bilstm_scan(xp_f, xp_b, mask, w_f, w_b)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mT_f), np.asarray(hT_f),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mT_b), np.asarray(hT_b),
                               atol=1e-5, rtol=1e-5)
