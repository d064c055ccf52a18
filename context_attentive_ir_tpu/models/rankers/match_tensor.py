"""Match-Tensor (Jaech et al. 2017): 3-D similarity tensor ranker.

Parity target: ``neuroir/rankers/match_tensor.py`` (SURVEY.md SS2.4, marker
``exp:``; BASELINE.json:9): BiLSTM token states on both sides, a 3-D
match tensor of channel-wise products (plus an exact-match channel), 2-D
convolutions over the (query-pos, doc-pos) plane, and an MLP scorer.

TPU shape (the BASELINE.json:5 "match-tensor ... batched MXU einsum over
whole candidate slates" kernel): the 3-D tensor for all 50 candidates is a
single broadcast product ``q_proj[b,i,c] * d_proj[b,n,j,c]`` -- XLA fuses
the two channel projections (MXU matmuls) with the broadcast multiply; the
convs run over the flattened ``[B*N, Lq, Ld, C+1]`` volume.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import ModelConfig
from ...constants import PAD
from ...data.vectorize import RankBatch
from ...ops.layers import MLP
from ...ops.rnn import RNNEncoder
from ..base import compute_dtype, make_embeddings


class MatchTensor(nn.Module):
    config: ModelConfig
    pretrained: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, batch: RankBatch, deterministic: bool = True):
        cfg = self.config
        dt = compute_dtype(cfg)
        emb = make_embeddings(cfg, self.pretrained)
        q = emb.lookup_padded(batch.query, deterministic)
        d = emb.lookup_padded(batch.docs, deterministic)
        B, N, Ld, E = d.shape
        Lq = q.shape[1]
        C = cfg.nfilters

        q_enc = RNNEncoder(cfg.nhid, cfg.nlayers, cfg.rnn_type,
                           cfg.bidirection, cfg.dropout_rnn, dtype=dt,
                           name="query_encoder",
                   use_pallas=cfg.use_pallas_rnn,
                   in_features=cfg.emsize)
        d_enc = RNNEncoder(cfg.nhid, cfg.nlayers, cfg.rnn_type,
                           cfg.bidirection, cfg.dropout_rnn, dtype=dt,
                           name="doc_encoder",
                   use_pallas=cfg.use_pallas_rnn,
                   in_features=cfg.emsize)
        qs, _ = q_enc(q, batch.query_mask, deterministic)   # [B, Lq, H2]
        ds, _ = d_enc(d.reshape(B * N, Ld, E),
                      batch.doc_mask.reshape(B * N, Ld),
                      deterministic)                        # [B*N, Ld, H2]
        ds = ds.reshape(B, N, Ld, -1)

        # channel projections + slate-wide broadcast product
        qp = nn.Dense(C, dtype=dt, name="q_proj")(qs)       # [B, Lq, C]
        dp = nn.Dense(C, dtype=dt, name="d_proj")(ds)       # [B, N, Ld, C]
        tensor = qp[:, None, :, None, :] * dp[:, :, None, :, :]
        # exact-match channel
        exact = ((batch.query[:, None, :, None] == batch.docs[:, :, None, :])
                 & (batch.query[:, None, :, None] != PAD))
        tensor = jnp.concatenate(
            [tensor, exact[..., None].astype(dt)], axis=-1)  # [B,N,Lq,Ld,C+1]
        pair_mask = (batch.query_mask[:, None, :, None]
                     & batch.doc_mask[:, :, None, :])
        tensor = tensor * pair_mask[..., None].astype(dt)

        z = tensor.reshape(B * N, Lq, Ld, C + 1)
        z = nn.Conv(C, kernel_size=(3, 3), padding="SAME", dtype=dt,
                    name="conv0")(z)
        z = jax.nn.relu(z)
        z = nn.max_pool(z, window_shape=(2, 2), strides=(2, 2))
        z = nn.Conv(C, kernel_size=(3, 3), padding="SAME", dtype=dt,
                    name="conv1")(z)
        z = jax.nn.relu(z)
        z = jnp.max(z, axis=(1, 2))                          # [B*N, C]
        z = z.reshape(B, N, C)
        z = nn.Dropout(cfg.dropout)(z, deterministic=deterministic)
        mlp = MLP((cfg.nhid_ffnn, 1), activation=jax.nn.relu,
                  final_activation=False, dropout=cfg.dropout, dtype=dt,
                  name="scorer")
        return mlp(z, deterministic)[..., 0]                 # [B, N]
