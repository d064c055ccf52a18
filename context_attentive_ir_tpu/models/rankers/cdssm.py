"""CDSSM: Convolutional DSSM.

Parity target: ``neuroir/rankers/cdssm.py`` (SURVEY.md SS2.4, marker
``exp:``; BASELINE.json:8): 1-D convolution + global max-pool tower per
side -> semantic vector -> cosine.

TPU shape: the doc tower convolves the flattened ``[B*N, Ld, E]`` slate in
one conv (an MXU matmul after im2col), then max-pools -- the 50-candidate
slate is one kernel launch, not 50.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import ModelConfig
from ...data.vectorize import RankBatch
from ...ops.layers import cosine_similarity
from ...ops.masking import NEG_INF
from ..base import compute_dtype, make_embeddings


class _ConvTower(nn.Module):
    nfilters: int
    widths: tuple[int, ...]
    out_dim: int
    dropout: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        """x [B, T, E], mask [B, T] -> [B, out_dim]."""
        # zero pad positions first: the convs' receptive fields otherwise
        # read PAD embeddings from neighbouring (masked) slots
        x = x * mask[..., None].astype(x.dtype)
        feats = []
        for w in self.widths:
            h = nn.Conv(self.nfilters, kernel_size=(w,), padding="SAME",
                        dtype=self.dtype, name=f"conv{w}")(x)
            h = jnp.tanh(h)
            h = jnp.where(mask[..., None], h, NEG_INF)
            feats.append(jnp.max(h, axis=-2))
        h = jnp.concatenate(feats, axis=-1)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(h)
        return jnp.tanh(out)


class CDSSM(nn.Module):
    config: ModelConfig
    pretrained: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: RankBatch, deterministic: bool = True):
        cfg = self.config
        dt = compute_dtype(cfg)
        emb = make_embeddings(cfg, self.pretrained)
        tower = _ConvTower(cfg.nfilters, cfg.filter_widths, 128,
                           cfg.dropout, dt, name="tower")
        q = emb(batch.query, deterministic)                  # [B, Lq, E]
        d = emb(batch.docs, deterministic)                   # [B, N, Ld, E]
        B, N, Ld, E = d.shape
        qv = tower(q, batch.query_mask, deterministic)       # [B, 128]
        dv = tower(d.reshape(B * N, Ld, E),
                   batch.doc_mask.reshape(B * N, Ld),
                   deterministic).reshape(B, N, -1)          # [B, N, 128]
        gamma = self.param("gamma", nn.initializers.constant(10.0), ())
        return gamma * cosine_similarity(qv[:, None, :], dv)
