"""Recurrent encoders as MXU-friendly ``lax.scan``s.

Parity target: the reference's ``neuroir/modules/encoder.py`` RNN wrapper
(uni/bi LSTM/GRU, ``--rnn_type --bidirection --nlayers --nhid``;
SURVEY.md SS2.3, marker ``exp:``).

TPU-first redesign (NOT a port of cuDNN RNNs):

- The input projection ``x @ W_x`` for *all* timesteps is hoisted out of the
  recurrence into one large ``[B*T, D] @ [D, 4H]`` matmul that XLA tiles onto
  the MXU.  Only the ``h @ W_h`` recurrence + elementwise gates live inside
  ``lax.scan`` -- the standard TPU RNN decomposition.
- Padding is handled by carrying state through masked steps (``jnp.where``),
  so no host-side packing/sorting is needed and shapes stay static.
- Gate ordering matches torch (``i, f, g, o`` for LSTM; ``r, z, n`` for GRU)
  so the golden-value tests in ``tests/test_rnn_golden.py`` can copy torch
  weights verbatim (SURVEY.md SS4).
- A fused Pallas kernel for the scan body lives in ``ops/pallas/lstm.py``;
  this module is the always-correct reference path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def lstm_scan(
    x_proj: jnp.ndarray,   # [B, T, 4H]  = x @ W_ih + b (precomputed)
    mask: jnp.ndarray,     # bool [B, T]
    w_hh: jnp.ndarray,     # [H, 4H]
    h0: jnp.ndarray,       # [B, H]
    c0: jnp.ndarray,       # [B, H]
    reverse: bool = False,
):
    """Masked LSTM over time. Returns (outputs [B, T, H], (hT, cT))."""
    H = w_hh.shape[0]

    def step(carry, inp):
        h, c = carry
        xp, m = inp  # [B, 4H], [B]
        gates = xp + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        m = m[:, None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        return (h, c), h

    xs = (jnp.swapaxes(x_proj, 0, 1), jnp.swapaxes(mask, 0, 1))
    (hT, cT), outs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    outs = jnp.swapaxes(outs, 0, 1)  # [B, T, H]
    outs = outs * mask[..., None].astype(outs.dtype)
    del H
    return outs, (hT, cT)


def bilstm_scan(
    x_proj_f: jnp.ndarray,  # [B, T, 4H] = x @ W_ih_fwd + b_fwd
    x_proj_b: jnp.ndarray,  # [B, T, 4H] = x @ W_ih_bwd + b_bwd
    mask: jnp.ndarray,      # bool [B, T]
    w_hh_f: jnp.ndarray,    # [H, 4H]
    w_hh_b: jnp.ndarray,    # [H, 4H]
):
    """Both BiLSTM directions in ONE ``lax.scan``.

    The separate-scan formulation is per-step-overhead-bound on TPU
    (measured nearly flat in batch size, PERF.md round-2 crossover):
    running forward and backward as one scan halves the sequential step
    count and doubles each step's matmul ([2, B, H] @ [2, H, 4H], a
    batched MXU matmul) -- same math, zero initial state.

    Returns (out_f [B, T, H], out_b [B, T, H], hT_f [B, H], hT_b [B, H])
    with masked positions zeroed and state carried through padding,
    exactly like two ``lstm_scan`` calls.
    """
    B, T, G = x_proj_f.shape
    H = G // 4
    w = jnp.stack([w_hh_f, w_hh_b])                        # [2, H, 4H]

    xs_f = jnp.swapaxes(x_proj_f, 0, 1)                    # [T, B, 4H]
    xs_b = jnp.swapaxes(x_proj_b, 0, 1)[::-1]              # reversed time
    m_f = jnp.swapaxes(mask, 0, 1)
    m_b = m_f[::-1]
    xs = jnp.stack([xs_f, xs_b], axis=1)                   # [T, 2, B, 4H]
    ms = jnp.stack([m_f, m_b], axis=1)                     # [T, 2, B]

    def step(carry, inp):
        h, c = carry                                       # [2, B, H]
        xp, m = inp
        gates = xp + jnp.einsum("dbh,dhg->dbg", h, w)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        m = m[..., None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        return (h, c), h

    h0 = jnp.zeros((2, B, H), x_proj_f.dtype)
    (hT, _cT), outs = jax.lax.scan(step, (h0, h0), (xs, ms))
    out_f = jnp.swapaxes(outs[:, 0], 0, 1)
    out_b = jnp.swapaxes(outs[::-1, 1], 0, 1)              # un-reverse
    mexp = mask[..., None].astype(out_f.dtype)
    return out_f * mexp, out_b * mexp, hT[0], hT[1]


def gru_scan(
    x_proj: jnp.ndarray,   # [B, T, 3H] = x @ W_ih + b_ih
    mask: jnp.ndarray,     # bool [B, T]
    w_hh: jnp.ndarray,     # [H, 3H]
    b_hh: jnp.ndarray,     # [3H]  (separate, needed for torch-exact n-gate)
    h0: jnp.ndarray,       # [B, H]
    reverse: bool = False,
):
    """Masked GRU over time (torch gate semantics). Returns (outs, hT)."""
    H = w_hh.shape[0]

    def step(h, inp):
        xp, m = inp
        hp = h @ w_hh + b_hh
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h = jnp.where(m[:, None], h_new, h)
        return h, h

    xs = (jnp.swapaxes(x_proj, 0, 1), jnp.swapaxes(mask, 0, 1))
    hT, outs = jax.lax.scan(step, h0, xs, reverse=reverse)
    outs = jnp.swapaxes(outs, 0, 1)
    outs = outs * mask[..., None].astype(outs.dtype)
    del H
    return outs, hT


class RNNLayer(nn.Module):
    """One (optionally bidirectional) LSTM/GRU layer.

    ``use_pallas=True`` dispatches to the fused Pallas kernels
    (``ops/pallas/{lstm,gru}.py``) when the shape qualifies (hidden %
    128 == 0, TPU backend): TRAINING always takes the fused forward +
    chunked-remat backward pair (the measured +27-29% full-step win);
    inference consults the measured per-shape dispatch table
    (``ops/dispatch.py``), falling back to the ~6k-row crossover for
    unmeasured shapes.  Unsupported shapes use the ``lax.scan`` path.
    """

    features: int
    rnn_type: str = "lstm"       # 'lstm' | 'gru'
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # logical input width when x arrives lane-padded from
    # Embeddings.lookup_padded: w_ih is declared [in_features, G] and its
    # (tiny) zero row-pad happens at use, instead of padding the (huge)
    # activation -- checkpoint shapes stay independent of TPU alignment
    in_features: Optional[int] = None

    def _pallas_ok(self, x: jnp.ndarray, h0, deterministic: bool) -> bool:
        if not (self.use_pallas and h0 is None):
            return False
        if jax.default_backend() != "tpu":
            return False
        if self.rnn_type == "lstm":
            from .pallas.lstm import fused_supported as supported
        elif self.rnn_type == "gru":
            from .pallas.gru import gru_fused_supported as supported
        else:
            return False
        if not supported(x.shape[-1], self.features, x.shape[0]):
            return False
        # Kernel-vs-scan choice comes from the on-chip-measured dispatch
        # table (ops/dispatch.py; regenerated by scripts/tpu_experiments
        # dispatch_table).  Training defaults to the kernel pair (the
        # chunked-remat backward is the dominant measured win, PERF.md)
        # unless a measured mode="train" row at the shape says otherwise
        # (round 4: the T=15/2000-row family is such an exception).
        from .dispatch import prefer_kernel

        e = self.in_features or x.shape[-1]
        return prefer_kernel(self.rnn_type, x.shape[0], x.shape[1], e,
                             self.features, jnp.dtype(self.dtype).name,
                             training=not deterministic)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 h0: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        B, T, D_in = x.shape
        D = self.in_features or D_in
        H = self.features
        n_gates = 4 if self.rnn_type == "lstm" else 3
        dirs = ["fwd", "bwd"] if self.bidirectional else ["fwd"]
        outs, finals = [], []
        x = x.astype(self.dtype)
        # NOTE: a merged-direction scan (ops.rnn.bilstm_scan -- both
        # BiLSTM directions in one lax.scan) was measured END-TO-END
        # SLOWER on v5e (score 17.9 vs 13.4 ms; the [2, B, H] @
        # [2, H, 4H] batched matmul and time-stacked layout lower worse
        # than two flat scans -- PERF.md r2 #10), so it is NOT
        # dispatched; kept equivalence-tested for the record.
        for d in dirs:
            w_ih = self.param(f"w_ih_{d}", nn.initializers.glorot_uniform(),
                              (D, n_gates * H), self.param_dtype)
            if D_in != D:
                # lane-padded input (zero tail): zero rows keep it exact
                w_ih = jnp.pad(w_ih, ((0, D_in - D), (0, 0)))
            w_hh = self.param(f"w_hh_{d}", nn.initializers.orthogonal(),
                              (H, n_gates * H), self.param_dtype)
            b_ih = self.param(f"b_ih_{d}", nn.initializers.zeros,
                              (n_gates * H,), self.param_dtype)
            h_init = jnp.zeros((B, H), self.dtype) if h0 is None else h0
            if self.rnn_type == "lstm" and self._pallas_ok(
                    x, h0, deterministic):
                from .pallas.lstm import lstm_pallas_fused

                # fused kernel computes the input projection on-chip:
                # no [B, T, 4H] gate tensor ever touches HBM
                o = lstm_pallas_fused(
                    x, mask, w_ih.astype(self.dtype),
                    b_ih.astype(self.dtype),
                    w_hh.astype(self.dtype), d == "bwd")
                if d == "bwd":
                    hT = o[:, 0]
                else:
                    last = jnp.maximum(
                        jnp.sum(mask.astype(jnp.int32), -1) - 1, 0)
                    hT = jnp.take_along_axis(
                        o, last[:, None, None], axis=1)[:, 0]
            elif self.rnn_type == "lstm":
                # one big MXU matmul over all timesteps
                x_proj = x @ w_ih.astype(self.dtype) + b_ih.astype(self.dtype)
                o, (hT, _cT) = lstm_scan(
                    x_proj, mask, w_hh.astype(self.dtype), h_init,
                    jnp.zeros((B, H), self.dtype), reverse=(d == "bwd"))
            else:
                b_hh = self.param(f"b_hh_{d}", nn.initializers.zeros,
                                  (n_gates * H,), self.param_dtype)
                if self._pallas_ok(x, h0, deterministic):
                    from .pallas.gru import gru_pallas_fused

                    o = gru_pallas_fused(
                        x, mask, w_ih.astype(self.dtype),
                        b_ih.astype(self.dtype), w_hh.astype(self.dtype),
                        b_hh.astype(self.dtype), d == "bwd")
                    # hT extraction assumes masks are contiguous-from-front
                    # (length-based sequence_mask, the only producer in
                    # this codebase): the kernel zeroes masked positions in
                    # its output, so for an interior mask gap o[last-valid]
                    # would differ from the carried state gru_scan returns.
                    if d == "bwd":
                        hT = o[:, 0]
                    else:
                        last = jnp.maximum(
                            jnp.sum(mask.astype(jnp.int32), -1) - 1, 0)
                        hT = jnp.take_along_axis(
                            o, last[:, None, None], axis=1)[:, 0]
                else:
                    x_proj = (x @ w_ih.astype(self.dtype)
                              + b_ih.astype(self.dtype))
                    o, hT = gru_scan(x_proj, mask, w_hh.astype(self.dtype),
                                     b_hh.astype(self.dtype), h_init,
                                     reverse=(d == "bwd"))
            outs.append(o)
            finals.append(hT)
        out = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        final = jnp.concatenate(finals, axis=-1) if len(finals) > 1 else finals[0]
        return out, final


class RNNEncoder(nn.Module):
    """Stacked RNN encoder: per-token states + final state.

    Mirrors the reference ``Encoder`` contract (SURVEY.md SS2.3): returns
    hidden states ``[B, T, H*dirs]`` and the final state ``[B, H*dirs]``.
    Inter-layer dropout follows the reference's ``--dropout_rnn``.
    """

    features: int               # per-direction hidden size
    num_layers: int = 1
    rnn_type: str = "lstm"
    bidirectional: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    in_features: Optional[int] = None  # see RNNLayer.in_features

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True):
        out = x
        final = None
        for layer in range(self.num_layers):
            if layer > 0 and self.dropout > 0:
                out = nn.Dropout(self.dropout)(
                    out, deterministic=deterministic)
            out, final = RNNLayer(
                self.features, self.rnn_type, self.bidirectional,
                self.dtype, self.param_dtype, self.use_pallas,
                in_features=self.in_features if layer == 0 else None,
                name=f"layer{layer}")(out, mask,
                                      deterministic=deterministic)
        return out, final
