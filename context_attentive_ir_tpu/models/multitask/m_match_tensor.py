"""M-MatchTensor: multitask MatchTensor (interaction ranking + suggestion).

Parity target: ``neuroir/multitask/m_match_tensor.py`` (SURVEY.md SS2.6,
marker ``exp:``): MatchTensor-style interaction ranking over each turn's
slate, plus a shared-encoder query decoder for next-query generation, with
a session-level recurrence tying the turns together.

TPU shape: one broadcast channel-product builds the 3-D match tensors for
all ``B x S x N`` slates at once (MXU projections + fused multiply); convs
run over the flattened ``[B*S*N, Lq, Ld, C+1]`` volume; the decoder scans
once over ``[B*S]`` rows.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import ModelConfig
from ...constants import PAD
from ...data.vectorize import SessionBatch
from ...ops.decoder import AttnLSTMDecoder
from ...ops.layers import MLP
from ...ops.masking import masked_max
from ...ops.rnn import RNNEncoder, RNNLayer
from ..base import compute_dtype, make_embeddings
from ..generator import Generator
from .mnsrf import inclusive_causal_mask


class MMatchTensor(nn.Module):
    config: ModelConfig
    pretrained: Optional[np.ndarray] = None

    def setup(self):
        cfg = self.config
        dt = compute_dtype(cfg)
        self._h2 = cfg.nhid * (2 if cfg.bidirection else 1)
        self.embeddings = make_embeddings(cfg, self.pretrained)
        self.query_encoder = RNNEncoder(cfg.nhid, cfg.nlayers, cfg.rnn_type,
                                        cfg.bidirection, cfg.dropout_rnn,
                                        dtype=dt,
                   use_pallas=cfg.use_pallas_rnn,
                   in_features=cfg.emsize)
        self.doc_encoder = RNNEncoder(cfg.nhid, cfg.nlayers, cfg.rnn_type,
                                      cfg.bidirection, cfg.dropout_rnn,
                                      dtype=dt,
                   use_pallas=cfg.use_pallas_rnn,
                   in_features=cfg.emsize)
        self.q_proj = nn.Dense(cfg.nfilters, dtype=dt)
        self.d_proj = nn.Dense(cfg.nfilters, dtype=dt)
        self.conv0 = nn.Conv(cfg.nfilters, kernel_size=(3, 3),
                             padding="SAME", dtype=dt)
        self.conv1 = nn.Conv(cfg.nfilters, kernel_size=(3, 3),
                             padding="SAME", dtype=dt)
        self.rank_mlp = MLP((cfg.nhid_ffnn, 1), activation=jax.nn.relu,
                            final_activation=False, dropout=cfg.dropout,
                            dtype=dt)
        self.session_rnn = RNNLayer(self._h2, cfg.session_rnn_type,
                                    bidirectional=False, dtype=dt)
        self.decoder = AttnLSTMDecoder(features=self._h2,
                                       embed_dim=cfg.emsize,
                                       num_layers=cfg.nlayers,
                                       attn_type=cfg.attn_type,
                                       dropout=cfg.dropout_rnn, dtype=dt)
        self.generator = Generator(cfg.vocab_size, tie=cfg.tie_embeddings,
                                   dtype=dt)

    def encode_session(self, batch: SessionBatch,
                       deterministic: bool = True):
        cfg = self.config
        B, S, Lq = batch.query.shape
        _, _, N, Ld = batch.docs.shape
        C = cfg.nfilters
        q = self.embeddings.lookup_padded(batch.query, deterministic)
        d = self.embeddings.lookup_padded(batch.docs, deterministic)

        q_states, _ = self.query_encoder(
            q.reshape(B * S, Lq, -1), batch.query_mask.reshape(B * S, Lq),
            deterministic)
        q_states = q_states.reshape(B, S, Lq, -1)
        qv = masked_max(q_states, batch.query_mask, axis=-2)   # [B, S, H2]
        d_states, _ = self.doc_encoder(
            d.reshape(B * S * N, Ld, -1),
            batch.doc_mask.reshape(B * S * N, Ld), deterministic)
        d_states = d_states.reshape(B, S, N, Ld, -1)

        # slate-wide match tensors
        qp = self.q_proj(q_states)                             # [B,S,Lq,C]
        dp = self.d_proj(d_states)                             # [B,S,N,Ld,C]
        tensor = qp[:, :, None, :, None, :] * dp[:, :, :, None, :, :]
        exact = ((batch.query[:, :, None, :, None]
                  == batch.docs[:, :, :, None, :])
                 & (batch.query[:, :, None, :, None] != PAD))
        tensor = jnp.concatenate(
            [tensor, exact[..., None].astype(tensor.dtype)], axis=-1)
        pmask = (batch.query_mask[:, :, None, :, None]
                 & batch.doc_mask[:, :, :, None, :])
        tensor = tensor * pmask[..., None].astype(tensor.dtype)

        z = tensor.reshape(B * S * N, Lq, Ld, C + 1)
        z = jax.nn.relu(self.conv0(z))
        z = nn.max_pool(z, window_shape=(2, 2), strides=(2, 2))
        z = jax.nn.relu(self.conv1(z))
        z = jnp.max(z, axis=(1, 2)).reshape(B, S, N, C)

        sess, _ = self.session_rnn(qv, batch.turn_mask)        # [B, S, H2]
        return q_states, z, sess

    def rank_scores(self, z, sess, deterministic: bool = True):
        sb = jnp.broadcast_to(sess[:, :, None, :],
                              z.shape[:3] + (sess.shape[-1],))
        return self.rank_mlp(jnp.concatenate([z, sb], -1),
                             deterministic)[..., 0]

    def __call__(self, batch: SessionBatch, deterministic: bool = True):
        B, S, _ = batch.query.shape
        Lt = batch.target_in.shape[-1]
        q_states, z, sess = self.encode_session(batch, deterministic)
        scores = self.rank_scores(z, sess, deterministic)
        memory = jnp.broadcast_to(sess[:, None], (B, S) + sess.shape[1:])
        memory = memory.reshape(B * S, S, -1)
        mem_mask = inclusive_causal_mask(batch.turn_mask).reshape(B * S, S)
        init = sess.reshape(B * S, -1)
        tgt = self.embeddings(batch.target_in, deterministic)
        attn_hs, _ = self.decoder(tgt.reshape(B * S, Lt, -1), memory,
                                  mem_mask, init, deterministic)
        logits = self.generator(attn_hs, self.embeddings)
        return {"scores": scores,
                "gen_logits": logits.reshape(B, S, Lt, -1)}

    def score(self, batch: SessionBatch):
        _, z, sess = self.encode_session(batch, True)
        return self.rank_scores(z, sess)

    def encode_queries(self, batch: SessionBatch,
                       deterministic: bool = True):
        """Query-only session state (see MNSRF.encode_queries): decoding
        depends on the query-flow alone, so no doc/match-tensor work."""
        B, S, Lq = batch.query.shape
        q = self.embeddings.lookup_padded(batch.query, deterministic)
        q_states, _ = self.query_encoder(
            q.reshape(B * S, Lq, -1), batch.query_mask.reshape(B * S, Lq),
            deterministic)
        qv = masked_max(q_states.reshape(B, S, Lq, -1), batch.query_mask,
                        axis=-2)
        sess, _ = self.session_rnn(qv, batch.turn_mask)
        return sess

    def decode_init(self, batch: SessionBatch):
        B, S, _ = batch.query.shape
        sess = self.encode_queries(batch, True)
        memory = jnp.broadcast_to(sess[:, None], (B, S) + sess.shape[1:])
        memory = memory.reshape(B * S, S, -1)
        mem_mask = inclusive_causal_mask(batch.turn_mask).reshape(B * S, S)
        state = self.decoder.init_state(B * S, sess.reshape(B * S, -1))
        return state, memory, mem_mask

    def decode_step(self, state, tokens, memory, memory_mask):
        emb_t = self.embeddings(tokens, True)
        state, attn_h, align = self.decoder.step(state, emb_t, memory,
                                                  memory_mask)
        logits = self.generator(attn_h, self.embeddings)
        # raw logits: greedy/beam normalize internally (decode/beam.py)
        return state, logits, align
