"""Fused slate-interaction (query-aware attention pool) kernel vs the XLA
reference (interpreter mode on CPU; real-TPU parity is asserted by the
bench regression harness each round)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from context_attentive_ir_tpu.ops.pallas.slate import (
    _pool_fused_impl,
    attn_pool_pallas,
    attn_pool_reference,
)

R, T, H = 40, 9, 128  # H lane-aligned (kernel contract); R unaligned


def _inputs(seed=0, r=R, t=T, h=H, all_valid_row0=True):
    rng = np.random.RandomState(seed)
    states = rng.normal(size=(r, t, h)).astype(np.float32) * 0.5
    query = rng.normal(size=(r, h)).astype(np.float32) * 0.5
    w_p = (rng.normal(size=(h, h)) * 0.15).astype(np.float32)
    b_p = (rng.normal(size=(h,)) * 0.1).astype(np.float32)
    lens = rng.randint(1, t + 1, size=(r,))
    if all_valid_row0:
        lens[0] = t
    mask = np.arange(t)[None, :] < lens[:, None]
    # encoder contract: masked token states are zeroed
    states = states * mask[:, :, None]
    return (jnp.asarray(states), jnp.asarray(mask), jnp.asarray(query),
            jnp.asarray(w_p), jnp.asarray(b_p))


def test_pool_kernel_matches_reference():
    s, m, q, wp, bp = _inputs()
    ref = attn_pool_reference(s, m, q, wp, bp)
    out = _pool_fused_impl(s, m, q, wp, bp, block_r=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_pool_kernel_fully_masked_rows_zero():
    s, m, q, wp, bp = _inputs(seed=3)
    m = m.at[5].set(False)
    ref = attn_pool_reference(s, m, q, wp, bp)
    out = _pool_fused_impl(s, m, q, wp, bp, block_r=16, interpret=True)
    assert np.allclose(np.asarray(out)[5], 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_pool_kernel_row_padding_exact():
    # R not a multiple of the row block: padded rows must not perturb output
    s, m, q, wp, bp = _inputs(seed=5, r=19)
    ref = attn_pool_reference(s, m, q, wp, bp)
    out = _pool_fused_impl(s, m, q, wp, bp, block_r=16, interpret=True)
    assert out.shape == (19, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_pool_custom_vjp_grads_match_reference():
    s, m, q, wp, bp = _inputs(seed=7, r=16, t=5)

    def loss_pallas(s, q, wp, bp):
        return jnp.sum(attn_pool_pallas(s, m, q, wp, bp) ** 2)

    def loss_ref(s, q, wp, bp):
        return jnp.sum(attn_pool_reference(s, m, q, wp, bp) ** 2)

    try:
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(s, q, wp, bp)
    except Exception as e:  # compiled pallas unsupported on cpu backend
        if "interpret" in str(e).lower() or "Mosaic" in str(e) or \
                "not implemented" in str(e).lower():
            pytest.skip(f"pallas compiled mode unavailable on CPU: {e}")
        raise
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(s, q, wp, bp)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_attention_pool_module_cpu_path_unchanged_by_flag():
    """With use_pallas=True on a non-TPU backend the module must silently
    use the einsum path and produce identical results."""
    from context_attentive_ir_tpu.ops.attention import AttentionPool

    rng = np.random.RandomState(9)
    s = jnp.asarray(rng.normal(size=(4, 6, 7, 128)).astype(np.float32))
    m = jnp.asarray(np.ones((4, 6, 7), bool))
    q = jnp.asarray(rng.normal(size=(4, 6, 128)).astype(np.float32))
    a = AttentionPool(dim=128, use_pallas=False)
    b = AttentionPool(dim=128, use_pallas=True)
    pa = a.init(jax.random.key(0), s, m, q)
    pb = b.init(jax.random.key(0), s, m, q)
    oa = a.apply(pa, s, m, q)
    ob = b.apply(pb, s, m, q)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-6)
