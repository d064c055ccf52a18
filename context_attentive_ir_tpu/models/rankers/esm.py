"""ESM: Embedding Space Model.

Parity target: ``neuroir/rankers/esm.py`` (SURVEY.md SS2.4, marker ``exp:``;
roster confirmed by BASELINE.json:7): mean of pretrained (frozen) word
embeddings for query and document, cosine similarity, no trainable
parameters beyond the (frozen) table.

TPU shape: the whole slate scores in one masked-mean + one cosine einsum --
no per-candidate loops.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from flax import linen as nn

from ...config import ModelConfig
from ...data.vectorize import RankBatch
from ...ops.layers import cosine_similarity
from ...ops.masking import masked_mean
from ..base import make_embeddings


class ESM(nn.Module):
    config: ModelConfig
    pretrained: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: RankBatch, deterministic: bool = True):
        emb = make_embeddings(self.config, self.pretrained)
        q = emb(batch.query, deterministic)                 # [B, Lq, E]
        d = emb(batch.docs, deterministic)                  # [B, N, Ld, E]
        qv = masked_mean(q, batch.query_mask)               # [B, E]
        dv = masked_mean(d, batch.doc_mask)                 # [B, N, E]
        return cosine_similarity(qv[:, None, :], dv)        # [B, N]
