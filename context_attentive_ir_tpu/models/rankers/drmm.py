"""DRMM (Guo et al. 2016): matching histograms + term gating.

Parity target: ``neuroir/rankers/drmm.py`` (SURVEY.md SS2.4, marker
``exp:``, "unverified presence -- paper baseline"; included for capability
completeness).

Per query term: a histogram of its cosine similarities to all doc terms
(log-count-based, LCH variant), fed to a small MLP producing a per-term
score; term-gating softmax (over a linear projection of the term embedding)
mixes per-term scores into the document score.

TPU shape: the reference's per-term Python/np histogramming becomes a fully
vectorized bucketize -- cosine tensor ``[B, N, Lq, Ld]`` -> one-hot bin
membership via comparisons -> sum over doc terms.  Static shapes, no loops;
the bin count is a compile-time constant.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import ModelConfig
from ...data.vectorize import RankBatch
from ...ops.layers import MLP
from ...ops.masking import masked_softmax
from ..base import compute_dtype, make_embeddings

NUM_BINS = 30


class DRMM(nn.Module):
    config: ModelConfig
    pretrained: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: RankBatch, deterministic: bool = True):
        cfg = self.config
        dt = compute_dtype(cfg)
        emb = make_embeddings(cfg, self.pretrained)
        q = emb(batch.query, deterministic)                  # [B, Lq, E]
        d = emb(batch.docs, deterministic)                   # [B, N, Ld, E]

        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
        dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        cos = jnp.einsum("bqe,bnde->bnqd", qn, dn)           # [B, N, Lq, Ld]

        # histogram: bins over [-1, 1]; exact-match (cos≈1) gets the top bin
        edges = jnp.linspace(-1.0, 1.0, NUM_BINS + 1)[1:-1]  # interior edges
        bin_idx = jnp.sum((cos[..., None] > edges).astype(jnp.int32), axis=-1)
        onehot = jax.nn.one_hot(bin_idx, NUM_BINS, dtype=dt)  # [B,N,Lq,Ld,K]
        pm = (batch.doc_mask[:, :, None, :, None].astype(dt)
              * batch.query_mask[:, None, :, None, None].astype(dt))
        counts = jnp.sum(onehot * pm, axis=-2)               # [B, N, Lq, K]
        hist = jnp.log1p(counts)                             # LCH variant

        term_score = MLP((cfg.nhid_ffnn, cfg.nhid_ffnn, 1),
                         activation=jnp.tanh, final_activation=False,
                         dtype=dt, name="hist_mlp")(
                             hist, deterministic)[..., 0]    # [B, N, Lq]

        gate_logit = nn.Dense(1, use_bias=False, dtype=dt,
                              name="gate")(q)[..., 0]        # [B, Lq]
        gate = masked_softmax(gate_logit, batch.query_mask)  # [B, Lq]
        return jnp.einsum("bnq,bq->bn", term_score, gate)    # [B, N]
