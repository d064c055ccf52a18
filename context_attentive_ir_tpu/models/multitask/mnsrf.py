"""M-NSRF: Multi-task Neural Session Relevance Framework (Ahmad et al. 2018).

Parity target: ``neuroir/multitask/mnsrf.py`` (SURVEY.md SS2.6, marker
``exp:``; BASELINE.json:10): shared BiLSTM query encoder, BiLSTM document
encoder, session-level LSTM over query vectors; ranking scores from an MLP
over (query, doc, session-state); an attention decoder generates the next
query from the session state; joint listwise + NLL loss.

TPU shape: all S turns x N candidates encode in ONE flattened RNN pass
(``[B*S*N, Ld]``); the session recurrence is a length-S ``lax.scan``; all
S decoders run as ONE teacher-forced scan over ``[B*S]`` rows, attending
over the session states with a causal (<= t) mask.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import ModelConfig
from ...data.vectorize import SessionBatch
from ...ops.decoder import AttnLSTMDecoder
from ...ops.layers import MLP
from ...ops.masking import masked_max
from ...ops.rnn import RNNEncoder, RNNLayer
from ..base import compute_dtype, make_embeddings
from ..generator import Generator


def inclusive_causal_mask(turn_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, S] -> [B, S, S]: turn t sees turns <= t (valid ones only)."""
    S = turn_mask.shape[-1]
    tri = jnp.tril(jnp.ones((S, S), bool), k=0)
    return tri[None] & turn_mask[:, None, :]


class MNSRF(nn.Module):
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
        self.session_rnn = RNNLayer(self._h2, cfg.session_rnn_type,
                                    bidirectional=False, dtype=dt)
        self.sess_mix = nn.Dense(self._h2, dtype=dt)
        self.rank_mlp = MLP((cfg.nhid_ffnn, 1), activation=jnp.tanh,
                            final_activation=False, dropout=cfg.dropout,
                            dtype=dt)
        self.decoder = AttnLSTMDecoder(features=self._h2,
                                       embed_dim=cfg.emsize,
                                       num_layers=cfg.nlayers,
                                       attn_type=cfg.attn_type,
                                       dropout=cfg.dropout_rnn, dtype=dt)
        self.generator = Generator(cfg.vocab_size, tie=cfg.tie_embeddings,
                                   dtype=dt)

    # -- encoding ------------------------------------------------------------

    def encode_session(self, batch: SessionBatch,
                       deterministic: bool = True):
        B, S, Lq = batch.query.shape
        _, _, N, Ld = batch.docs.shape
        q = self.embeddings.lookup_padded(batch.query, deterministic)
        d = self.embeddings.lookup_padded(batch.docs, deterministic)

        q_states, _ = self.query_encoder(
            q.reshape(B * S, Lq, -1), batch.query_mask.reshape(B * S, Lq),
            deterministic)
        qv = masked_max(q_states.reshape(B, S, Lq, -1), batch.query_mask,
                        axis=-2)                              # [B, S, H2]

        d_states, _ = self.doc_encoder(
            d.reshape(B * S * N, Ld, -1),
            batch.doc_mask.reshape(B * S * N, Ld), deterministic)
        dv = masked_max(d_states.reshape(B, S, N, Ld, -1), batch.doc_mask,
                        axis=-2)                              # [B, S, N, H2]

        sess, _ = self.session_rnn(qv, batch.turn_mask)       # [B, S, H2]
        return qv, dv, sess

    def rank_scores(self, qv, dv, sess, deterministic: bool = True):
        # Session-aware query representation, interacted MULTIPLICATIVELY
        # with the document (SURVEY.md SS2.6: "MLP/bilinear on (query,
        # doc, session-state)").  Root-caused in round 3 (VERDICT r2
        # next-round #2): the earlier additive concat [q, d, q*d, s]
        # plateaus at MAP ~0.63 on a query-keyed-only discriminative
        # corpus at every lr/epoch budget tried (60 epochs, lr 3e-3/1e-2)
        # because ranking there requires a session-state x doc-content
        # product the MLP must synthesize from raw concat inputs; forming
        # q~ = tanh(W[q; s]) and feeding [q~, d, q~*d] gives the
        # interaction directly -- same recipe, MAP 0.88 (phase transition
        # at ~epoch 40).  See RESULTS.md ladder.
        qs = jnp.tanh(self.sess_mix(jnp.concatenate([qv, sess], -1)))
        qb = jnp.broadcast_to(qs[:, :, None, :], dv.shape)
        feats = jnp.concatenate([qb, dv, qb * dv], axis=-1)
        return self.rank_mlp(feats, deterministic)[..., 0]    # [B, S, N]

    # -- forward -------------------------------------------------------------

    def __call__(self, batch: SessionBatch, deterministic: bool = True):
        B, S, _ = batch.query.shape
        Lt = batch.target_in.shape[-1]
        qv, dv, sess = self.encode_session(batch, deterministic)
        scores = self.rank_scores(qv, dv, sess, deterministic)

        # suggestion: every turn decodes its next query in one flat pass
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

    # -- inference -----------------------------------------------------------

    def encode_queries(self, batch: SessionBatch,
                       deterministic: bool = True):
        """Query-only session state: the suggestion head depends on the
        query-flow alone, so decoding never encodes the document slate
        (a pure win over routing decode_init through encode_session)."""
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

    def score(self, batch: SessionBatch):
        qv, dv, sess = self.encode_session(batch, True)
        return self.rank_scores(qv, dv, sess)
