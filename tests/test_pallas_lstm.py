"""Pallas fused-LSTM kernel vs the lax.scan reference (interpreter mode on
CPU; the real-TPU run happens in bench/serving paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from context_attentive_ir_tpu.ops.pallas.lstm import (
    _lstm_pallas_fwd_impl,
    lstm_pallas,
    lstm_pallas_reference,
)

B, T, H = 24, 7, 128  # H lane-aligned (kernel contract); B unaligned


def _inputs(seed=0, b=B, t=T, h=H):
    rng = np.random.RandomState(seed)
    x_proj = rng.normal(size=(b, t, 4 * h)).astype(np.float32) * 0.5
    w_hh = (rng.normal(size=(h, 4 * h)) * 0.3).astype(np.float32)
    lens = rng.randint(1, t + 1, size=(b,))
    lens[0] = t
    mask = np.arange(t)[None, :] < lens[:, None]
    return jnp.asarray(x_proj), jnp.asarray(mask), jnp.asarray(w_hh)


@pytest.mark.parametrize("reverse", [False, True])
def test_kernel_matches_scan(reverse):
    xp, mask, whh = _inputs()
    ref = lstm_pallas_reference(xp, mask, whh, reverse=reverse)
    out = _lstm_pallas_fwd_impl(xp, mask, whh, reverse=reverse,
                                block_b=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_kernel_masked_rows_zero():
    xp, mask, whh = _inputs(seed=1)
    out = np.asarray(_lstm_pallas_fwd_impl(xp, mask, whh, block_b=16,
                                           interpret=True))
    assert (out[~np.asarray(mask)] == 0).all()


def test_custom_vjp_grads_match_scan():
    xp, mask, whh = _inputs(seed=2, b=8, t=4, h=128)

    def loss_pallas(xp, whh):
        # interpret-mode path is wired through the public wrapper's impl;
        # grads flow through the scan-based custom_vjp
        return jnp.sum(lstm_pallas(xp, mask, whh) ** 2)

    def loss_ref(xp, whh):
        return jnp.sum(lstm_pallas_reference(xp, mask, whh) ** 2)

    try:
        gx, gw = jax.grad(loss_pallas, argnums=(0, 1))(xp, whh)
    except Exception as e:  # compiled pallas unsupported on cpu backend
        if "interpret" in str(e).lower() or "Mosaic" in str(e) or \
                "not implemented" in str(e).lower():
            pytest.skip(f"pallas compiled mode unavailable on CPU: {e}")
        raise
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(xp, whh)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-2,
                               rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-2,
                               rtol=1e-2)


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_kernel_matches_scan(reverse):
    from context_attentive_ir_tpu.ops.pallas.lstm import (
        _lstm_fused_impl,
        lstm_pallas_reference,
    )

    rng = np.random.RandomState(4)
    b, t, e, h = 24, 7, 128, 128
    x = jnp.asarray(rng.normal(size=(b, t, e)).astype(np.float32) * 0.3)
    w_ih = jnp.asarray((rng.normal(size=(e, 4 * h)) * 0.1).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=(4 * h,)) * 0.1).astype(np.float32))
    w_hh = jnp.asarray((rng.normal(size=(h, 4 * h)) * 0.1).astype(np.float32))
    lens = rng.randint(1, t + 1, size=(b,))
    lens[0] = t
    mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
    ref = lstm_pallas_reference(x @ w_ih + bias, mask, w_hh, reverse=reverse)
    out = _lstm_fused_impl(x, mask, w_ih, bias, w_hh, reverse=reverse,
                           block_b=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=2e-3)


def test_rnnlayer_use_pallas_falls_back_on_cpu():
    """With use_pallas=True on a non-TPU backend the layer must silently
    use the scan path and produce identical results/params."""
    from context_attentive_ir_tpu.ops.rnn import RNNLayer

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.normal(size=(8, 5, 128)).astype(np.float32))
    mask = jnp.asarray(np.ones((8, 5), bool))
    a = RNNLayer(features=128, use_pallas=False)
    b = RNNLayer(features=128, use_pallas=True)
    pa = a.init(jax.random.key(0), x, mask)
    pb = b.init(jax.random.key(0), x, mask)
    oa, fa = a.apply(pa, x, mask, deterministic=True)
    ob, fb = b.apply(pb, x, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_backward_kernel_matches_scan_grads(reverse):
    """Interpret-mode: the chunked-remat backward kernel must reproduce the
    scan-path gradients (dx, dW_ih, db, dW_hh)."""
    from context_attentive_ir_tpu.ops.pallas.lstm import (
        _lstm_fused_bwd_impl,
        _lstm_fused_res_impl,
        lstm_pallas_reference,
    )

    rng = np.random.RandomState(11)
    b, t, e, h = 24, 7, 128, 128
    x = jnp.asarray(rng.normal(size=(b, t, e)).astype(np.float32) * 0.3)
    w_ih = jnp.asarray((rng.normal(size=(e, 4 * h)) * 0.1).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=(4 * h,)) * 0.1).astype(np.float32))
    w_hh = jnp.asarray((rng.normal(size=(h, 4 * h)) * 0.1).astype(np.float32))
    lens = rng.randint(1, t + 1, size=(b,))
    lens[0] = t
    mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
    g = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32))

    # reference grads via autodiff of the scan path
    def ref(x, w_ih, bias, w_hh):
        return lstm_pallas_reference(x @ w_ih + bias, mask, w_hh,
                                     reverse=reverse)

    out_ref, vjp = jax.vjp(ref, x, w_ih, bias, w_hh)
    rx, rwih, rb, rwhh = vjp(g)

    out, hb, cb = _lstm_fused_res_impl(x, mask, w_ih, bias, w_hh,
                                       reverse=reverse, block_b=16,
                                       time_chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=5e-4, rtol=2e-3)
    dx, dwih, db, dwhh = _lstm_fused_bwd_impl(
        x, mask, w_ih, bias, w_hh, hb, cb, g, reverse=reverse,
        block_b=16, time_chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx),
                               atol=3e-3, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(dwih), np.asarray(rwih),
                               atol=3e-2, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(db), np.asarray(rb),
                               atol=3e-2, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(dwhh), np.asarray(rwhh),
                               atol=3e-2, rtol=3e-3)


def test_fused_kernel_unaligned_embed_dim():
    """E=300 (GloVe dims): internal lane padding must be exact, fwd + bwd."""
    from context_attentive_ir_tpu.ops.pallas.lstm import (
        _lstm_fused_bwd_impl,
        _lstm_fused_impl,
        _lstm_fused_res_impl,
        lstm_pallas_reference,
    )

    rng = np.random.RandomState(21)
    b, t, e, h = 16, 5, 300, 128
    x = jnp.asarray(rng.normal(size=(b, t, e)).astype(np.float32) * 0.3)
    w_ih = jnp.asarray((rng.normal(size=(e, 4 * h)) * 0.1).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=(4 * h,)) * 0.1).astype(np.float32))
    w_hh = jnp.asarray((rng.normal(size=(h, 4 * h)) * 0.1).astype(np.float32))
    mask = jnp.asarray(np.ones((b, t), bool))
    g = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32))

    ref = lstm_pallas_reference(x @ w_ih + bias, mask, w_hh)
    out = _lstm_fused_impl(x, mask, w_ih, bias, w_hh, block_b=16,
                           time_chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=2e-3)

    def fn(x, w_ih, bias, w_hh):
        return lstm_pallas_reference(x @ w_ih + bias, mask, w_hh)

    _, vjp = jax.vjp(fn, x, w_ih, bias, w_hh)
    rx, rwih, rb, rwhh = vjp(g)
    _, hb, cb = _lstm_fused_res_impl(x, mask, w_ih, bias, w_hh, block_b=16,
                                     time_chunk=4, interpret=True)
    dx, dwih, db, dwhh = _lstm_fused_bwd_impl(
        x, mask, w_ih, bias, w_hh, hb, cb, g, block_b=16, time_chunk=4,
        interpret=True)
    assert dx.shape == x.shape and dwih.shape == w_ih.shape
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx), atol=3e-3,
                               rtol=3e-3)
    np.testing.assert_allclose(np.asarray(dwih), np.asarray(rwih),
                               atol=3e-2, rtol=3e-3)


@pytest.mark.parametrize("reverse", [False, True])
def test_scan_res_matches_kernel_res(reverse):
    """The scan-forward residual path (used above the crossover) must emit
    the same outputs and chunk-boundary (h, c) as the res kernel, and feed
    the backward kernel to the same gradients."""
    from context_attentive_ir_tpu.ops.pallas.lstm import (
        _lstm_fused_bwd_impl,
        _lstm_fused_res_impl,
        _lstm_scan_res_impl,
        lstm_pallas_reference,
    )

    rng = np.random.RandomState(31)
    b, t, e, h = 24, 11, 128, 128
    x = jnp.asarray(rng.normal(size=(b, t, e)).astype(np.float32) * 0.3)
    w_ih = jnp.asarray((rng.normal(size=(e, 4 * h)) * 0.1).astype(np.float32))
    bias = jnp.asarray((rng.normal(size=(4 * h,)) * 0.1).astype(np.float32))
    w_hh = jnp.asarray((rng.normal(size=(h, 4 * h)) * 0.1).astype(np.float32))
    lens = rng.randint(1, t + 1, size=(b,))
    lens[0] = t
    mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
    g = jnp.asarray(rng.normal(size=(b, t, h)).astype(np.float32))

    out_s, hb_s, cb_s = _lstm_scan_res_impl(x, mask, w_ih, bias, w_hh,
                                            reverse=reverse, block_b=16,
                                            time_chunk=4)
    out_k, hb_k, cb_k = _lstm_fused_res_impl(x, mask, w_ih, bias, w_hh,
                                             reverse=reverse, block_b=16,
                                             time_chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_k),
                               atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(hb_s), np.asarray(hb_k),
                               atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(cb_s), np.asarray(cb_k),
                               atol=5e-4, rtol=2e-3)

    # grads via the backward kernel fed with the SCAN-path residuals
    def ref(x, w_ih, bias, w_hh):
        return lstm_pallas_reference(x @ w_ih + bias, mask, w_hh,
                                     reverse=reverse)

    _, vjp = jax.vjp(ref, x, w_ih, bias, w_hh)
    rx, rwih, rb, rwhh = vjp(g)
    dx, dwih, db, dwhh = _lstm_fused_bwd_impl(
        x, mask, w_ih, bias, w_hh, hb_s, cb_s, g, reverse=reverse,
        block_b=16, time_chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx),
                               atol=3e-3, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(dwih), np.asarray(rwih),
                               atol=3e-2, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(dwhh), np.asarray(rwhh),
                               atol=3e-2, rtol=3e-3)
