"""ARC-I and ARC-II (Hu et al. 2014).

Parity targets: ``neuroir/rankers/arci.py`` / ``arcii.py`` (SURVEY.md
SS2.4, markers ``exp:``; ARC-II confirmed by BASELINE.json:9).

- ARC-I: CNN sentence encoder per side (conv + max-pool stacks), MLP on the
  concatenated sentence vectors.
- ARC-II: interaction-first -- layer-1 features are built from *word pair
  combinations* ``z1[i, j] = relu(Wq q_i + Wd d_j + b)``, followed by 2-D
  conv + 2x2 max-pool blocks and an MLP scorer.

TPU shape: the ARC-II pair map is two matmuls + a broadcast add (one fused
MXU kernel per side for the whole slate) instead of materializing concat
pairs; 2-D convs run over the flattened ``[B*N, Lq, Ld, C]`` slate.
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
from ...ops.masking import NEG_INF
from ..base import compute_dtype, make_embeddings


class ARCI(nn.Module):
    config: ModelConfig
    pretrained: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: RankBatch, deterministic: bool = True):
        cfg = self.config
        dt = compute_dtype(cfg)
        emb = make_embeddings(cfg, self.pretrained)

        def encode(x, mask, name):
            # zero pad-position embeddings: SAME-padding convs otherwise
            # read (trainable, nonzero) PAD vectors through the receptive
            # field of boundary positions (pad-content invariance test)
            h = x * mask[..., None].astype(x.dtype)
            for i, w in enumerate(cfg.filter_widths):
                h = nn.Conv(cfg.nfilters, kernel_size=(w,), padding="SAME",
                            dtype=dt, name=f"{name}_conv{i}")(h)
                h = jax.nn.relu(h)
            h = jnp.where(mask[..., None], h, NEG_INF)
            return jnp.max(h, axis=-2)

        q = emb(batch.query, deterministic)
        d = emb(batch.docs, deterministic)
        B, N, Ld, E = d.shape
        qv = encode(q, batch.query_mask, "q")                       # [B, C]
        dv = encode(d.reshape(B * N, Ld, E),
                    batch.doc_mask.reshape(B * N, Ld),
                    "d").reshape(B, N, -1)                          # [B, N, C]
        pair = jnp.concatenate(
            [jnp.broadcast_to(qv[:, None, :], dv.shape), dv], axis=-1)
        mlp = MLP((cfg.nhid_ffnn, 1), activation=jax.nn.relu,
                  final_activation=False, dropout=cfg.dropout, dtype=dt,
                  name="scorer")
        return mlp(pair, deterministic)[..., 0]                     # [B, N]


class ARCII(nn.Module):
    config: ModelConfig
    pretrained: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: RankBatch, deterministic: bool = True):
        cfg = self.config
        dt = compute_dtype(cfg)
        emb = make_embeddings(cfg, self.pretrained)
        q = emb(batch.query, deterministic)          # [B, Lq, E]
        d = emb(batch.docs, deterministic)           # [B, N, Ld, E]
        B, N, Ld, E = d.shape
        Lq = q.shape[1]

        # layer 1: pairwise combination via two matmuls + broadcast add
        qf = nn.Dense(cfg.nfilters, dtype=dt, name="w_q")(q)        # [B, Lq, C]
        df = nn.Dense(cfg.nfilters, use_bias=False, dtype=dt,
                      name="w_d")(d)                                # [B, N, Ld, C]
        z = jax.nn.relu(qf[:, None, :, None, :] + df[:, :, None, :, :])
        # mask invalid word pairs
        pair_mask = (batch.query_mask[:, None, :, None]
                     & batch.doc_mask[:, :, None, :])
        z = z * pair_mask[..., None].astype(z.dtype)
        z = z.reshape(B * N, Lq, Ld, cfg.nfilters)

        # conv blocks: 2-D conv + 2x2 max-pool
        for i in range(2):
            z = nn.Conv(cfg.nfilters, kernel_size=(3, 3), padding="SAME",
                        dtype=dt, name=f"conv{i}")(z)
            z = jax.nn.relu(z)
            z = nn.max_pool(z, window_shape=(2, 2), strides=(2, 2))

        z = z.reshape(B, N, -1)
        z = nn.Dropout(cfg.dropout)(z, deterministic=deterministic)
        mlp = MLP((cfg.nhid_ffnn, 1), activation=jax.nn.relu,
                  final_activation=False, dropout=cfg.dropout, dtype=dt,
                  name="scorer")
        return mlp(z, deterministic)[..., 0]                        # [B, N]
