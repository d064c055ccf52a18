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
