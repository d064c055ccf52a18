"""Pallas fused-GRU kernel vs the lax.scan reference (interpreter mode on
CPU; the real-TPU run happens via bench's regression harness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from context_attentive_ir_tpu.ops.pallas.gru import (
    _gru_fused_impl,
    gru_pallas_reference,
)

B, T, E, H = 24, 7, 128, 128


def _inputs(seed=0, b=B, t=T, e=E, h=H):
    rng = np.random.RandomState(seed)
    x = (rng.normal(size=(b, t, e)) * 0.3).astype(np.float32)
    w_ih = (rng.normal(size=(e, 3 * h)) * 0.1).astype(np.float32)
    b_ih = (rng.normal(size=(3 * h,)) * 0.1).astype(np.float32)
    w_hh = (rng.normal(size=(h, 3 * h)) * 0.1).astype(np.float32)
    b_hh = (rng.normal(size=(3 * h,)) * 0.1).astype(np.float32)
    lens = rng.randint(1, t + 1, size=(b,))
    lens[0] = t
    mask = np.arange(t)[None, :] < lens[:, None]
    return tuple(jnp.asarray(a) for a in (x, mask, w_ih, b_ih, w_hh, b_hh))


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_kernel_matches_scan(reverse):
    x, mask, w_ih, b_ih, w_hh, b_hh = _inputs()
    ref = gru_pallas_reference(x, mask, w_ih, b_ih, w_hh, b_hh,
                               reverse=reverse)
    out = _gru_fused_impl(x, mask, w_ih, b_ih, w_hh, b_hh, reverse=reverse,
                          block_b=16, time_chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=2e-3)


def test_gru_kernel_masked_rows_zero():
    x, mask, w_ih, b_ih, w_hh, b_hh = _inputs(seed=1)
    out = np.asarray(_gru_fused_impl(x, mask, w_ih, b_ih, w_hh, b_hh,
                                     block_b=16, interpret=True))
    assert (out[~np.asarray(mask)] == 0).all()


def test_gru_kernel_unaligned_embed_dim():
    """E=300 (GloVe dims): internal lane padding must be exact."""
    x, mask, w_ih, b_ih, w_hh, b_hh = _inputs(seed=2, b=16, t=5, e=300)
    ref = gru_pallas_reference(x, mask, w_ih, b_ih, w_hh, b_hh)
    out = _gru_fused_impl(x, mask, w_ih, b_ih, w_hh, b_hh, block_b=16,
                          time_chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=2e-3)


def test_gru_rnnlayer_flag_is_noop_on_cpu():
    """use_pallas=True + rnn_type=gru on a non-TPU backend: scan path,
    identical outputs."""
    from context_attentive_ir_tpu.ops.rnn import RNNLayer

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.normal(size=(8, 5, 128)).astype(np.float32))
    mask = jnp.asarray(np.ones((8, 5), bool))
    a = RNNLayer(features=128, rnn_type="gru", use_pallas=False)
    b = RNNLayer(features=128, rnn_type="gru", use_pallas=True)
    pa = a.init(jax.random.key(0), x, mask)
    pb = b.init(jax.random.key(0), x, mask)
    oa, fa = a.apply(pa, x, mask, deterministic=True)
    ob, fb = b.apply(pb, x, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_backward_kernel_matches_scan_grads(reverse):
    """Interpret-mode: the GRU chunked-remat backward kernel must
    reproduce the scan-path gradients (dx, dW_ih, db_ih, dW_hh, db_hh) —
    including the n-slot hh/ih gate asymmetry."""
    from context_attentive_ir_tpu.ops.pallas.gru import (
        _gru_fused_bwd_impl,
        _gru_fused_res_impl,
        gru_pallas_reference,
    )

    x, mask, w_ih, b_ih, w_hh, b_hh = _inputs(seed=13)
    rng = np.random.RandomState(14)
    g = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))

    def ref(x, w_ih, b_ih, w_hh, b_hh):
        return gru_pallas_reference(x, mask, w_ih, b_ih, w_hh, b_hh,
                                    reverse=reverse)

    out_ref, vjp = jax.vjp(ref, x, w_ih, b_ih, w_hh, b_hh)
    rx, rwih, rbih, rwhh, rbhh = vjp(g)

    out, hb = _gru_fused_res_impl(x, mask, w_ih, b_ih, w_hh, b_hh,
                                  reverse=reverse, block_b=16,
                                  time_chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=5e-4, rtol=2e-3)
    dx, dwih, dbih, dwhh, dbhh = _gru_fused_bwd_impl(
        x, mask, w_ih, b_ih, w_hh, b_hh, hb, g, reverse=reverse,
        block_b=16, time_chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx),
                               atol=3e-3, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(dwih), np.asarray(rwih),
                               atol=3e-2, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(dbih), np.asarray(rbih),
                               atol=3e-2, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(dwhh), np.asarray(rwhh),
                               atol=3e-2, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(dbhh), np.asarray(rbhh),
                               atol=3e-2, rtol=3e-3)


def test_gru_backward_kernel_unaligned_embed_dim():
    """E=300: lane padding must be exact through the backward pair."""
    from context_attentive_ir_tpu.ops.pallas.gru import (
        _gru_fused_bwd_impl,
        _gru_fused_res_impl,
        gru_pallas_reference,
    )

    x, mask, w_ih, b_ih, w_hh, b_hh = _inputs(seed=15, b=16, t=5, e=300)
    rng = np.random.RandomState(16)
    g = jnp.asarray(rng.normal(size=(16, 5, H)).astype(np.float32))

    def ref(x, w_ih, b_ih, w_hh, b_hh):
        return gru_pallas_reference(x, mask, w_ih, b_ih, w_hh, b_hh)

    _, vjp = jax.vjp(ref, x, w_ih, b_ih, w_hh, b_hh)
    rx, rwih, _, _, _ = vjp(g)
    _, hb = _gru_fused_res_impl(x, mask, w_ih, b_ih, w_hh, b_hh,
                                block_b=16, time_chunk=4, interpret=True)
    dx, dwih, _, _, _ = _gru_fused_bwd_impl(
        x, mask, w_ih, b_ih, w_hh, b_hh, hb, g, block_b=16, time_chunk=4,
        interpret=True)
    assert dx.shape == x.shape and dwih.shape == w_ih.shape
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx), atol=3e-3,
                               rtol=3e-3)
    np.testing.assert_allclose(np.asarray(dwih), np.asarray(rwih),
                               atol=3e-2, rtol=3e-3)
