"""ACG: attend-copy-generate query suggestion (Dehghani et al. 2017).

Parity targets: ``neuroir/recommender/acg.py`` and the copy generator in
``neuroir/modules/copy_generator.py`` (SURVEY.md SS2.5/SS2.3, markers
``exp:``, flagged "unverified presence -- paper baseline"; included for
capability completeness): seq2seq over the concatenated session queries
with a pointer/copy mechanism over source tokens.

TPU shape: the copy distribution is scattered onto the vocabulary with one
``align @ one_hot(source)`` einsum (an MXU matmul over the slate of source
positions) instead of per-token scatter loops; the model returns fully
normalized mixture *probabilities* (copy + generate), so its loss is
``copy_generator_nll_loss`` and its decode log-probs are ``log(p)``.
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
from ...ops.rnn import RNNEncoder
from ..base import compute_dtype, make_embeddings
from ..generator import Generator


class ACG(nn.Module):
    config: ModelConfig
    pretrained: Optional[np.ndarray] = None

    def setup(self):
        cfg = self.config
        dt = compute_dtype(cfg)
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
        self.copy_gate = nn.Dense(1, name="copy_gate", dtype=dt)

    def _mix(self, attn_h, align, source, source_mask):
        """Mixture distribution [.., V] from gen logits + copy alignment."""
        cfg = self.config
        gen = jax.nn.softmax(self.generator(attn_h, self.embeddings), axis=-1)
        p_copy = jax.nn.sigmoid(self.copy_gate(attn_h))       # [..., 1]
        align = align * source_mask.astype(align.dtype)
        align = align / jnp.maximum(
            jnp.sum(align, axis=-1, keepdims=True), 1e-10)
        src_onehot = jax.nn.one_hot(source, cfg.vocab_size, dtype=gen.dtype)
        copy = jnp.einsum("...s,...sv->...v", align, src_onehot)
        return (1.0 - p_copy) * gen + p_copy * copy

    def encode(self, batch: SuggestBatch, deterministic: bool = True):
        src = self.embeddings.lookup_padded(batch.source, deterministic)
        memory, final = self.encoder(src, batch.source_mask, deterministic)
        return memory, batch.source_mask, final

    def __call__(self, batch: SuggestBatch, deterministic: bool = True):
        """Returns normalized probabilities [B, T, V] (not logits)."""
        memory, memory_mask, final = self.encode(batch, deterministic)
        tgt = self.embeddings(batch.target_in, deterministic)
        attn_hs, aligns = self.decoder(tgt, memory, memory_mask, final,
                                       deterministic)
        src = batch.source[:, None, :]                  # broadcast over T
        src_mask = batch.source_mask[:, None, :]
        return self._mix(attn_hs, aligns, src, src_mask)

    def decode_init(self, batch: SuggestBatch):
        memory, memory_mask, final = self.encode(batch, True)
        state = self.decoder.init_state(memory.shape[0], final)
        # source ids ride along for the copy scatter at each step
        return state, memory, memory_mask

    def decode_step(self, state, tokens, memory, memory_mask,
                    source=None, source_mask=None):
        emb_t = self.embeddings(tokens, True)
        state, attn_h, align = self.decoder.step(state, emb_t, memory,
                                                 memory_mask)
        if source is None:
            # raw logits: greedy/beam normalize internally (decode/beam.py)
            logits = self.generator(attn_h, self.embeddings)
            return state, logits, align
        # copy path: already-normalized log-probs (the mixture sums to 1;
        # the decoder-side logsumexp shift is then ~0, still exact)
        probs = self._mix(attn_h, align, source, source_mask)
        return state, jnp.log(jnp.maximum(probs, 1e-10)), align
