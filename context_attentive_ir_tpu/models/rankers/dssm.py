"""DSSM: Deep Structured Semantic Model (two-tower MLP).

Parity target: ``neuroir/rankers/dssm.py`` (SURVEY.md SS2.4, marker
``exp:``; BASELINE.json:8): per-side representation -> tanh MLP tower ->
cosine similarity.  The repo variant pools *word embeddings* (SURVEY notes
the letter-trigram hashing original; ``config.use_charngram`` enables a
trigram-hash analogue via summed trigram-id embeddings).

TPU shape: both towers run as single ``[B(*N), E] @ [E, H]`` matmuls over
the flattened slate; a learned temperature sharpens the cosine scores for
the listwise softmax (the original's gamma).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import ModelConfig
from ...data.vectorize import RankBatch
from ...ops.layers import MLP, cosine_similarity
from ...ops.masking import masked_mean
from ..base import compute_dtype, make_embeddings


class DSSM(nn.Module):
    config: ModelConfig
    pretrained: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: RankBatch, deterministic: bool = True):
        cfg = self.config
        dt = compute_dtype(cfg)
        emb = make_embeddings(cfg, self.pretrained)
        tower = MLP(layer_sizes=(cfg.nhid_ffnn, cfg.nhid_ffnn, 128),
                    activation=jnp.tanh, dropout=cfg.dropout, dtype=dt,
                    name="tower")
        q = masked_mean(emb(batch.query, deterministic), batch.query_mask)
        d = masked_mean(emb(batch.docs, deterministic), batch.doc_mask)
        if cfg.use_charngram and batch.query_chars is not None:
            # word-hashing analogue: char-CNN word vectors pooled like the
            # word embeddings and concatenated into the tower input
            from ...constants import CHAR_VOCAB_SIZE
            from ...ops.layers import CharCNN

            cnn = CharCNN(CHAR_VOCAB_SIZE, dtype=dt, name="char_cnn")
            qc = masked_mean(cnn(batch.query_chars), batch.query_mask)
            dc = masked_mean(cnn(batch.doc_chars), batch.doc_mask)
            q = jnp.concatenate([q, qc], axis=-1)
            d = jnp.concatenate([d, dc], axis=-1)
        qv = tower(q, deterministic)                         # [B, 128]
        dv = tower(d, deterministic)                         # [B, N, 128]
        gamma = self.param("gamma", nn.initializers.constant(10.0), ())
        return gamma * cosine_similarity(qv[:, None, :], dv)  # [B, N]
