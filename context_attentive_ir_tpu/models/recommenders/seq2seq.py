"""Seq2seq(+Attention) next-query recommender.

Parity target: ``neuroir/recommender/seq2seq.py`` (SURVEY.md SS2.5, marker
``exp:``): encode the session context (flat concatenation of previous
queries), attention decoder generates the next query, token NLL loss.

Decode contract shared by all suggestion models (consumed by ``decode/``):

- ``decode_init(batch)``  -> (decoder state, memory, memory_mask)
- ``decode_step(state, tokens, memory, memory_mask)``
                          -> (new state, log-probs [B, V])
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from flax import linen as nn

from ...config import ModelConfig
from ...data.vectorize import SuggestBatch
from ...ops.decoder import AttnLSTMDecoder
from ...ops.rnn import RNNEncoder
from ..base import compute_dtype, make_embeddings
from ..generator import Generator


class Seq2seq(nn.Module):
    config: ModelConfig
    pretrained: Optional[np.ndarray] = None

    def setup(self):
        cfg = self.config
        dt = compute_dtype(cfg)
        self._dt = dt
        self.embeddings = make_embeddings(cfg, self.pretrained)
        self.encoder = RNNEncoder(cfg.nhid, cfg.nlayers, cfg.rnn_type,
                                  cfg.bidirection, cfg.dropout_rnn, dtype=dt,
                   use_pallas=cfg.use_pallas_rnn,
                   in_features=cfg.emsize)
        h2 = cfg.nhid * (2 if cfg.bidirection else 1)
        self.decoder = AttnLSTMDecoder(features=h2, embed_dim=cfg.emsize,
                                       num_layers=cfg.nlayers,
                                       attn_type=cfg.attn_type,
                                       dropout=cfg.dropout_rnn, dtype=dt)
        self.generator = Generator(cfg.vocab_size, tie=cfg.tie_embeddings,
                                   dtype=dt)

    def encode(self, batch: SuggestBatch, deterministic: bool = True):
        if self.config.ablate_history:
            # history-blind floor (config.ablate_history): encode ONLY the
            # last valid context turn (the current query) -- everything an
            # ahistorical suggester can see.  Used as the falsifiable
            # lower rung of the suggestion capability ladder (RESULTS.md).
            import jax.numpy as jnp

            counts = jnp.sum(batch.turn_mask.astype(jnp.int32), axis=-1)
            idx = jnp.maximum(counts - 1, 0)[:, None, None]
            cur = jnp.take_along_axis(batch.context, idx, axis=1)[:, 0]
            cur_mask = jnp.take_along_axis(batch.context_mask, idx,
                                           axis=1)[:, 0]
            src = self.embeddings.lookup_padded(cur, deterministic)
            memory, final = self.encoder(src, cur_mask, deterministic)
            return memory, cur_mask, final
        src = self.embeddings.lookup_padded(batch.source, deterministic)
        memory, final = self.encoder(src, batch.source_mask, deterministic)
        return memory, batch.source_mask, final

    def __call__(self, batch: SuggestBatch, deterministic: bool = True):
        memory, memory_mask, final = self.encode(batch, deterministic)
        tgt = self.embeddings(batch.target_in, deterministic)
        attn_hs, _ = self.decoder(tgt, memory, memory_mask, final,
                                  deterministic)
        return self.generator(attn_hs, self.embeddings)   # [B, T, V]

    # -- inference ----------------------------------------------------------

    def decode_init(self, batch: SuggestBatch):
        memory, memory_mask, final = self.encode(batch, True)
        state = self.decoder.init_state(memory.shape[0], final)
        return state, memory, memory_mask

    def decode_step(self, state, tokens, memory, memory_mask):
        emb_t = self.embeddings(tokens, True)
        state, attn_h, align = self.decoder.step(state, emb_t, memory,
                                                  memory_mask)
        logits = self.generator(attn_h, self.embeddings)
        # raw logits: greedy/beam normalize internally (decode/beam.py)
        return state, logits, align
