"""Golden-value tests: scan RNNs vs torch CPU reference (SURVEY.md SS4).

Torch weights are copied verbatim into the JAX modules (gate orders match by
construction, see ops/rnn.py docstring), then outputs are compared on random
padded inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from context_attentive_ir_tpu.ops.rnn import RNNLayer, gru_scan, lstm_scan

B, T, D, H = 4, 7, 12, 16


def _random_mask(rng, b, t):
    lens = rng.randint(1, t + 1, size=(b,))
    lens[0] = t  # at least one full-length row
    mask = np.zeros((b, t), dtype=bool)
    for i, n in enumerate(lens):
        mask[i, :n] = True
    return mask, lens


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
def test_scan_matches_torch(rnn_type):
    rng = np.random.RandomState(0)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    mask, lens = _random_mask(rng, B, T)

    torch_rnn = (torch.nn.LSTM if rnn_type == "lstm" else torch.nn.GRU)(
        D, H, batch_first=True)
    with torch.no_grad():
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.tensor(x), torch.tensor(lens), batch_first=True,
            enforce_sorted=False)
        out_packed, _ = torch_rnn(packed)
        ref, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out_packed, batch_first=True, total_length=T)
        ref = ref.numpy()

    w_ih = torch_rnn.weight_ih_l0.detach().numpy().T  # [D, G*H]
    w_hh = torch_rnn.weight_hh_l0.detach().numpy().T  # [H, G*H]
    b_ih = torch_rnn.bias_ih_l0.detach().numpy()
    b_hh = torch_rnn.bias_hh_l0.detach().numpy()

    xj = jnp.asarray(x)
    mj = jnp.asarray(mask)
    if rnn_type == "lstm":
        x_proj = xj @ w_ih + (b_ih + b_hh)
        out, _ = lstm_scan(x_proj, mj, jnp.asarray(w_hh),
                           jnp.zeros((B, H)), jnp.zeros((B, H)))
    else:
        x_proj = xj @ w_ih + b_ih
        out, _ = gru_scan(x_proj, mj, jnp.asarray(w_hh), jnp.asarray(b_hh),
                          jnp.zeros((B, H)))
    out = np.asarray(out)
    np.testing.assert_allclose(out * mask[..., None], ref * mask[..., None],
                               atol=2e-5)


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
def test_bidirectional_layer_matches_torch(rnn_type):
    rng = np.random.RandomState(1)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    mask, lens = _random_mask(rng, B, T)

    torch_rnn = (torch.nn.LSTM if rnn_type == "lstm" else torch.nn.GRU)(
        D, H, batch_first=True, bidirectional=True)
    with torch.no_grad():
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.tensor(x), torch.tensor(lens), batch_first=True,
            enforce_sorted=False)
        out_packed, _ = torch_rnn(packed)
        ref, _ = torch.nn.utils.rnn.pad_packed_sequence(
            out_packed, batch_first=True, total_length=T)
        ref = ref.numpy()

    layer = RNNLayer(features=H, rnn_type=rnn_type, bidirectional=True)
    params = layer.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(mask))
    p = dict(params["params"])
    for d, suffix in (("fwd", "l0"), ("bwd", "l0_reverse")):
        p[f"w_ih_{d}"] = jnp.asarray(
            getattr(torch_rnn, f"weight_ih_{suffix}").detach().numpy().T)
        p[f"w_hh_{d}"] = jnp.asarray(
            getattr(torch_rnn, f"weight_hh_{suffix}").detach().numpy().T)
        bi = getattr(torch_rnn, f"bias_ih_{suffix}").detach().numpy()
        bh = getattr(torch_rnn, f"bias_hh_{suffix}").detach().numpy()
        if rnn_type == "lstm":
            p[f"b_ih_{d}"] = jnp.asarray(bi + bh)
        else:
            p[f"b_ih_{d}"] = jnp.asarray(bi)
            p[f"b_hh_{d}"] = jnp.asarray(bh)
    out, _ = layer.apply({"params": p}, jnp.asarray(x), jnp.asarray(mask))
    out = np.asarray(out)
    np.testing.assert_allclose(out * mask[..., None], ref * mask[..., None],
                               atol=2e-5)


def test_masked_steps_carry_state():
    """State must pass through padded steps unchanged."""
    rng = np.random.RandomState(2)
    x = rng.normal(size=(1, 5, D)).astype(np.float32)
    w_hh = rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.1
    w_ih = rng.normal(size=(D, 4 * H)).astype(np.float32) * 0.1
    full_mask = np.ones((1, 5), dtype=bool)
    short_mask = full_mask.copy()
    short_mask[0, 3:] = False
    xp = jnp.asarray(x) @ w_ih
    _, (h_full3, _) = lstm_scan(xp[:, :3], jnp.asarray(full_mask[:, :3]),
                                jnp.asarray(w_hh), jnp.zeros((1, H)),
                                jnp.zeros((1, H)))
    _, (h_short, _) = lstm_scan(xp, jnp.asarray(short_mask),
                                jnp.asarray(w_hh), jnp.zeros((1, H)),
                                jnp.zeros((1, H)))
    np.testing.assert_allclose(np.asarray(h_full3), np.asarray(h_short),
                               atol=1e-6)
