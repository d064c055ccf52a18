"""HRED-QS: hierarchical recurrent encoder-decoder for query suggestion
(Sordoni et al. 2015).

Parity target: ``neuroir/recommender/hredqs.py`` (SURVEY.md SS2.5, marker
``exp:``): query-level RNN -> session-level RNN -> decoder conditioned on
the session state.

TPU shape: all S context queries encode in ONE flattened ``[B*S, Lq]``
RNN pass (not a Python loop over turns); the session-level recurrence is a
short ``lax.scan`` over S; the decoder attends over the per-turn query
vectors so padded turns are masked, and is initialized from the *last
valid* session state (a static-shape gather).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import ModelConfig
from ...data.vectorize import SuggestBatch
from ...ops.decoder import AttnLSTMDecoder
from ...ops.rnn import RNNEncoder, RNNLayer
from ..base import compute_dtype, make_embeddings
from ..generator import Generator


def last_valid(states: jnp.ndarray, turn_mask: jnp.ndarray) -> jnp.ndarray:
    """states [B, S, H], mask [B, S] -> state at the last True turn [B, H]."""
    counts = jnp.sum(turn_mask.astype(jnp.int32), axis=-1)
    idx = jnp.maximum(counts - 1, 0)
    return jnp.take_along_axis(states, idx[:, None, None], axis=1)[:, 0]


class HredQS(nn.Module):
    config: ModelConfig
    pretrained: Optional[np.ndarray] = None

    def setup(self):
        cfg = self.config
        dt = compute_dtype(cfg)
        self.embeddings = make_embeddings(cfg, self.pretrained)
        self.query_encoder = RNNEncoder(cfg.nhid, cfg.nlayers, cfg.rnn_type,
                                        cfg.bidirection, cfg.dropout_rnn,
                                        dtype=dt,
                   use_pallas=cfg.use_pallas_rnn,
                   in_features=cfg.emsize)
        h2 = cfg.nhid * (2 if cfg.bidirection else 1)
        self.session_rnn = RNNLayer(h2, cfg.session_rnn_type,
                                    bidirectional=False, dtype=dt)
        self.decoder = AttnLSTMDecoder(features=h2, embed_dim=cfg.emsize,
                                       num_layers=cfg.nlayers,
                                       attn_type=cfg.attn_type,
                                       dropout=cfg.dropout_rnn, dtype=dt)
        self.generator = Generator(cfg.vocab_size, tie=cfg.tie_embeddings,
                                   dtype=dt)

    def encode(self, batch: SuggestBatch, deterministic: bool = True):
        B, S, Lq = batch.context.shape
        ctx = self.embeddings.lookup_padded(batch.context,
                                            deterministic)   # [B, S, Lq, E]
        flat = ctx.reshape(B * S, Lq, -1)
        flat_mask = batch.context_mask.reshape(B * S, Lq)
        _, qvec = self.query_encoder(flat, flat_mask, deterministic)
        qvec = qvec.reshape(B, S, -1)                         # [B, S, H2]
        sess, _ = self.session_rnn(qvec, batch.turn_mask)     # [B, S, H2]
        init = last_valid(sess, batch.turn_mask)
        return sess, batch.turn_mask, init

    def __call__(self, batch: SuggestBatch, deterministic: bool = True):
        memory, memory_mask, init = self.encode(batch, deterministic)
        tgt = self.embeddings(batch.target_in, deterministic)
        attn_hs, _ = self.decoder(tgt, memory, memory_mask, init,
                                  deterministic)
        return self.generator(attn_hs, self.embeddings)

    def decode_init(self, batch: SuggestBatch):
        memory, memory_mask, init = self.encode(batch, True)
        state = self.decoder.init_state(memory.shape[0], init)
        return state, memory, memory_mask

    def decode_step(self, state, tokens, memory, memory_mask):
        emb_t = self.embeddings(tokens, True)
        state, attn_h, align = self.decoder.step(state, emb_t, memory,
                                                  memory_mask)
        logits = self.generator(attn_h, self.embeddings)
        # raw logits: greedy/beam normalize internally (decode/beam.py)
        return state, logits, align
