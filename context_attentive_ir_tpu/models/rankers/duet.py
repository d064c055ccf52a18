"""DUET (Mitra et al. 2017): local exact-match + distributed branches.

Parity target: ``neuroir/rankers/duet.py`` (SURVEY.md SS2.4, marker
``exp:``, flagged "unverified presence -- paper baseline"; included for
capability completeness).

- Local branch: binary exact-match interaction matrix ``X[i, j] = 1 iff
  q_i == d_j`` -> conv over the doc axis -> MLP.
- Distributed branch: embedding-based query vector and per-position doc
  features; elementwise product -> MLP.
- Final score = local + distributed.

TPU shape: the exact-match matrix is one integer-equality broadcast over
the whole slate; both branches are slate-flattened convs/matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import ModelConfig
from ...data.vectorize import RankBatch
from ...ops.layers import MLP
from ...ops.masking import NEG_INF
from ..base import compute_dtype, make_embeddings


class DUET(nn.Module):
    config: ModelConfig
    pretrained: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: RankBatch, deterministic: bool = True):
        cfg = self.config
        dt = compute_dtype(cfg)
        B, N, Ld = batch.docs.shape
        Lq = batch.query.shape[1]

        # ---- local branch: exact-match interaction --------------------------
        match = (batch.query[:, None, :, None] == batch.docs[:, :, None, :])
        # mask by the MASKS, not by id == PAD: masked slots may legally
        # hold any id (masks carry truth -- repo convention)
        match &= (batch.query_mask[:, None, :, None]
                  & batch.doc_mask[:, :, None, :])
        x = match.astype(dt)                                  # [B, N, Lq, Ld]
        x = x.reshape(B * N, Lq, Ld).transpose(0, 2, 1)       # [B*N, Ld, Lq]
        h = nn.Conv(cfg.nfilters, kernel_size=(3,), padding="SAME",
                    dtype=dt, name="local_conv")(x)
        h = jnp.tanh(h)
        # masked max: conv bias gives pad positions a nonzero tanh floor,
        # so an unmasked max would score empty/short docs by pad length
        dm = batch.doc_mask.reshape(B * N, Ld, 1)
        h = jnp.max(jnp.where(dm, h, NEG_INF), axis=-2)       # [B*N, C]
        h = jnp.where(dm.any(axis=-2), h, 0.0)   # all-pad doc -> zero feat
        local = MLP((cfg.nhid_ffnn, 1), activation=jnp.tanh,
                    final_activation=False, dropout=cfg.dropout, dtype=dt,
                    name="local_mlp")(h, deterministic)[..., 0]
        local = local.reshape(B, N)

        # ---- distributed branch --------------------------------------------
        emb = make_embeddings(cfg, self.pretrained)
        q = emb(batch.query, deterministic)                   # [B, Lq, E]
        d = emb(batch.docs, deterministic)                    # [B, N, Ld, E]
        # zero pad-position embeddings before the convs (see local branch)
        q = q * batch.query_mask[..., None].astype(q.dtype)
        d = d * batch.doc_mask[..., None].astype(d.dtype)
        qh = nn.Conv(cfg.nfilters, kernel_size=(3,), padding="SAME",
                     dtype=dt, name="dist_q_conv")(q)
        qh = jnp.where(batch.query_mask[..., None], jnp.tanh(qh), NEG_INF)
        qv = jnp.max(qh, axis=-2)                             # [B, C]
        dh = nn.Conv(cfg.nfilters, kernel_size=(3,), padding="SAME",
                     dtype=dt, name="dist_d_conv")(
                         d.reshape(B * N, Ld, -1))
        dh = jnp.tanh(dh)
        dh = dh * batch.doc_mask.reshape(B * N, Ld, 1).astype(dt)
        prod = qv[:, None, None, :] * dh.reshape(B, N, Ld, -1)  # [B, N, Ld, C]
        pooled = jnp.sum(prod, axis=-2)                       # [B, N, C]
        dist = MLP((cfg.nhid_ffnn, 1), activation=jnp.tanh,
                   final_activation=False, dropout=cfg.dropout, dtype=dt,
                   name="dist_mlp")(pooled, deterministic)[..., 0]

        return local + dist                                    # [B, N]
