"""Attention LSTM decoder with input feeding.

Parity target: ``neuroir/modules/decoder.py`` (SURVEY.md SS2.3, marker
``exp:``): single/multi-layer LSTM decoder, input-feeding, Luong attention
over encoder memory; used by seq2seq / HRED-QS / ACG / M-NSRF / CARS
suggestion heads.

TPU-first design: parameters are created in ``setup`` as explicit arrays so
the same cell math is callable from (a) a teacher-forced ``lax.scan`` over
the whole target (training -- one trace, MXU-batched input projections) and
(b) a single ``step`` inside greedy/beam decode loops (``decode/``) without
any Python-level recurrence.  State is a plain pytree dict, which makes beam
reshuffling a pure gather.

Documented deviation: the reference's StackedLSTM applies dropout BETWEEN
layers inside the step; here dropout is applied to the attentional
outputs only, so multi-layer (``nlayers>=2``) decoder stacks regularize
differently.  With the paper's (and this repo's) default of one decoder
layer the two are identical -- per-step inter-layer dropout would force
rng threading through every jitted decode scan for a config the paper
never uses.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .masking import masked_softmax


def _dense_init(key, shape, dtype):
    return nn.initializers.glorot_uniform()(key, shape, dtype)


class AttnLSTMDecoder(nn.Module):
    """LSTM decoder + Luong attention. Emits attentional hidden states.

    The output projection to vocabulary logits is deliberately *not* inside
    this module: models own their generator (possibly weight-tied or a copy
    generator), and the alignment distribution is returned for pointer/copy
    models (SURVEY.md SS2.3 'Copy generator').
    """

    features: int                 # H (must equal memory feature size)
    embed_dim: int                # E
    num_layers: int = 1
    attn_type: str = "general"    # 'dot' | 'general'
    input_feed: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        H, E = self.features, self.embed_dim
        in0 = E + (H if self.input_feed else 0)
        self.w_ih = [
            self.param(f"w_ih{l}", _dense_init,
                       ((in0 if l == 0 else H), 4 * H), self.param_dtype)
            for l in range(self.num_layers)
        ]
        self.w_hh = [
            self.param(f"w_hh{l}", nn.initializers.orthogonal(),
                       (H, 4 * H), self.param_dtype)
            for l in range(self.num_layers)
        ]
        self.b = [
            self.param(f"b{l}", nn.initializers.zeros, (4 * H,),
                       self.param_dtype)
            for l in range(self.num_layers)
        ]
        if self.attn_type == "general":
            self.linear_in = self.param("linear_in", _dense_init, (H, H),
                                        self.param_dtype)
        self.linear_out = self.param("linear_out", _dense_init, (2 * H, H),
                                     self.param_dtype)
        self.drop = nn.Dropout(self.dropout)

    # -- state ---------------------------------------------------------------

    def init_state(self, batch_size: int,
                   init_hidden: Optional[jnp.ndarray] = None) -> dict:
        """init_hidden [B, H] seeds every layer's h (reference seeds the
        decoder from the encoder/session final state).

        Every state leaf is batch-leading ([B, ...]) so beam search can
        tile/gather the whole pytree uniformly (decode/beam.py).
        """
        H, L = self.features, self.num_layers
        zeros = jnp.zeros((batch_size, H), self.dtype)
        if init_hidden is not None:
            h0 = jnp.tanh(init_hidden.astype(self.dtype))
        else:
            h0 = zeros
        return {
            "h": tuple(h0 for _ in range(L)),
            "c": tuple(zeros for _ in range(L)),
            "input_feed": zeros,
        }

    # -- one decode step -----------------------------------------------------

    def step(self, state: dict, emb_t: jnp.ndarray, memory: jnp.ndarray,
             memory_mask: jnp.ndarray):
        """One timestep.  emb_t [B, E], memory [B, S, H], mask [B, S].

        Returns (new_state, attn_h [B, H], align [B, S]).
        """
        H = self.features
        x = emb_t.astype(self.dtype)
        if self.input_feed:
            x = jnp.concatenate([x, state["input_feed"]], axis=-1)
        hs, cs = [], []
        for l in range(self.num_layers):
            h_prev, c_prev = state["h"][l], state["c"][l]
            gates = (x @ self.w_ih[l].astype(self.dtype)
                     + h_prev @ self.w_hh[l].astype(self.dtype)
                     + self.b[l].astype(self.dtype))
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            hs.append(h)
            cs.append(c)
            x = h
        h_top = hs[-1]
        mem = memory.astype(self.dtype)
        q = h_top
        if self.attn_type == "general":
            q = q @ self.linear_in.astype(self.dtype)
        scores = jnp.einsum("bh,bsh->bs", q, mem)
        align = masked_softmax(scores, memory_mask, axis=-1)
        context = jnp.einsum("bs,bsh->bh", align, mem)
        attn_h = jnp.tanh(
            jnp.concatenate([context, h_top], axis=-1)
            @ self.linear_out.astype(self.dtype))
        new_state = {
            "h": tuple(hs), "c": tuple(cs), "input_feed": attn_h,
        }
        del H
        return new_state, attn_h, align

    # -- teacher-forced unroll ----------------------------------------------

    def __call__(self, emb_targets: jnp.ndarray, memory: jnp.ndarray,
                 memory_mask: jnp.ndarray,
                 init_hidden: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        """emb_targets [B, T, E] (BOS-shifted) -> (attn_hs [B, T, H],
        aligns [B, T, S])."""
        B = emb_targets.shape[0]
        state0 = self.init_state(B, init_hidden)

        def scan_step(state, emb_t):
            new_state, attn_h, align = self.step(state, emb_t, memory,
                                                 memory_mask)
            return new_state, (attn_h, align)

        _, (attn_hs, aligns) = jax.lax.scan(
            scan_step, state0, jnp.swapaxes(emb_targets, 0, 1))
        attn_hs = jnp.swapaxes(attn_hs, 0, 1)
        aligns = jnp.swapaxes(aligns, 0, 1)
        if self.dropout > 0:
            attn_hs = self.drop(attn_hs, deterministic=deterministic)
        return attn_hs, aligns
