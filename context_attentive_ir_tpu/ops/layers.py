"""Small shared layers: embeddings, highway, maxout, char encoder, MLP.

Parity targets (SURVEY.md SS2.3, marker ``exp:``):
- ``neuroir/modules/embeddings.py``   -> :class:`Embeddings`
- ``neuroir/modules/highway.py``      -> :class:`Highway`
- ``neuroir/modules/maxout.py``       -> :class:`Maxout`
- ``neuroir/modules/char_embedding.py`` -> :class:`CharCNN`
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Embeddings(nn.Module):
    """Word embedding table with optional pretrained init and freezing.

    ``pretrained`` rows initialize the table; ``fixed=True`` mirrors the
    reference's ``--fix_embeddings`` by stopping gradients through the
    lookup.  Embedding dropout follows ``--dropout_emb``.
    """

    vocab_size: int
    features: int
    pretrained: Optional[np.ndarray] = None
    fixed: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # int8 per-row symmetric quantization (serving). Halves the table's
    # HBM *footprint* (big-vocab models); measured ~20% slower per lookup
    # at V=50k on v5e (the gather is latency-bound and dequant adds a VPU
    # pass -- PERF.md), so enable for memory, not speed.  Params produced
    # by serve.quantize_embedding_params.
    quantized: bool = False

    def setup(self):
        if self.quantized:
            self.table_q = self.param(
                "embedding_q", nn.initializers.zeros,
                (self.vocab_size, self.features), jnp.int8)
            self.scale = self.param(
                "embedding_scale", nn.initializers.ones,
                (self.vocab_size, 1), jnp.float32)
        else:
            if self.pretrained is not None:
                pre = self.pretrained
                init = lambda *_: jnp.asarray(pre, self.param_dtype)
            else:
                init = nn.initializers.normal(stddev=0.1)
            self.table = self.param("embedding", init,
                                    (self.vocab_size, self.features),
                                    self.param_dtype)
        self.drop = nn.Dropout(self.dropout)

    def _table(self):
        if self.quantized:
            return (self.table_q.astype(self.dtype)
                    * self.scale.astype(self.dtype))
        t = self.table
        if self.fixed:
            t = jax.lax.stop_gradient(t)
        return t.astype(self.dtype)

    def __call__(self, ids: jnp.ndarray, deterministic: bool = True):
        if self.quantized:
            rows = jnp.take(self.table_q, ids, axis=0).astype(self.dtype)
            scales = jnp.take(self.scale, ids, axis=0).astype(self.dtype)
            out = rows * scales
        else:
            out = jnp.take(self._table(), ids, axis=0)
        if self.dropout > 0:
            out = self.drop(out, deterministic=deterministic)
        return out

    def lookup_padded(self, ids: jnp.ndarray,
                      deterministic: bool = True) -> jnp.ndarray:
        """Rows from a lane-padded table: [..., ceil128(E)] with zero tail.

        RNN-encoder feeds use this so unaligned embedding dims (GloVe's
        E=300) reach the fused Pallas kernels without a huge
        ``[B, T, E] -> [B, T, Ep]`` activation pad copy: the pad happens
        once on the [V, E] table (tiny next to the gather) and the gather
        emits aligned rows directly (PERF.md round-1 "pad copy eats the
        win" fix).  Encoders zero-pad their (small) ``w_ih`` to match --
        see ``ops.rnn.RNNLayer.in_features`` -- so the math is exact.
        No-op (plain ``__call__``) when E is already 128-aligned.
        """
        ep = -(-self.features // 128) * 128
        # sub-lane tables (tiny test/debug models) gain nothing from
        # alignment; only pad real model dims (GloVe 300 -> 384)
        if ep == self.features or self.features < 128:
            return self(ids, deterministic)
        if self.quantized:
            # quantized tables gather-then-scale per row; pad the gathered
            # rows (keeps the int8 table compact -- serving memory option)
            out = self(ids, deterministic)
            return jnp.pad(out, ((0, 0),) * (out.ndim - 1)
                           + ((0, ep - self.features),))
        t = jnp.pad(self._table(), ((0, 0), (0, ep - self.features)))
        out = jnp.take(t, ids, axis=0)
        if self.dropout > 0:
            out = self.drop(out, deterministic=deterministic)
        return out

    def attend(self, h: jnp.ndarray) -> jnp.ndarray:
        """Tied-generator logits: ``h [..., E] @ table.T -> [..., V]``."""
        if self.quantized:
            # scale AFTER the matmul (logits_v = s_v * (h @ q_v)): avoids
            # materializing the dequantized [V, E] table per decode step
            logits = h @ self.table_q.astype(self.dtype).T
            return logits * self.scale[:, 0].astype(self.dtype)
        return h @ self._table().T


def quantize_embedding_table(table: np.ndarray) -> tuple[np.ndarray,
                                                         np.ndarray]:
    """Per-row symmetric int8 quantization of an [V, E] table."""
    table = np.asarray(table, np.float32)
    scale = np.maximum(np.abs(table).max(axis=1, keepdims=True), 1e-8) / 127.0
    q = np.clip(np.round(table / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


class Highway(nn.Module):
    """y = g * relu(W1 x) + (1 - g) * x,  g = sigmoid(W2 x)."""

    num_layers: int = 1
    activation: Callable = jax.nn.relu
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        x = x.astype(self.dtype)
        dim = x.shape[-1]
        for i in range(self.num_layers):
            h = self.activation(nn.Dense(dim, dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name=f"lin{i}")(x))
            g = jax.nn.sigmoid(nn.Dense(dim, dtype=self.dtype,
                                        param_dtype=self.param_dtype,
                                        name=f"gate{i}")(x))
            x = g * h + (1.0 - g) * x
        return x


class Maxout(nn.Module):
    """Maxout projection: max over ``pool_size`` linear pieces."""

    features: int
    pool_size: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        out = nn.Dense(self.features * self.pool_size, dtype=self.dtype,
                       param_dtype=self.param_dtype)(x.astype(self.dtype))
        out = out.reshape(*out.shape[:-1], self.features, self.pool_size)
        return jnp.max(out, axis=-1)


class CharCNN(nn.Module):
    """Character-level conv word encoder (char-CNN embedding analogue).

    Byte ids [..., Lw] -> word vector [..., sum(num_filters)].
    """

    char_vocab: int
    char_dim: int = 16
    filter_widths: Sequence[int] = (2, 3, 4)
    num_filters: int = 32
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, char_ids: jnp.ndarray):
        emb = Embeddings(self.char_vocab, self.char_dim, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="char_emb")(char_ids)
        lead = emb.shape[:-2]
        x = emb.reshape((-1,) + emb.shape[-2:])  # [N, Lw, C]
        feats = []
        for w in self.filter_widths:
            c = nn.Conv(self.num_filters, kernel_size=(w,), dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"conv{w}")(x)
            feats.append(jnp.max(jax.nn.relu(c), axis=-2))
        out = jnp.concatenate(feats, axis=-1)
        return out.reshape(lead + (out.shape[-1],))


class MLP(nn.Module):
    """Plain feed-forward stack used by tower/scorer heads."""

    layer_sizes: Sequence[int]
    activation: Callable = jnp.tanh
    final_activation: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        x = x.astype(self.dtype)
        for i, size in enumerate(self.layer_sizes):
            x = nn.Dense(size, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"fc{i}")(x)
            last = i == len(self.layer_sizes) - 1
            if not last or self.final_activation:
                x = self.activation(x)
            if self.dropout > 0 and not last:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray,
                      axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    na = jnp.linalg.norm(a, axis=axis, keepdims=True)
    nb = jnp.linalg.norm(b, axis=axis, keepdims=True)
    return jnp.sum((a / jnp.maximum(na, eps)) * (b / jnp.maximum(nb, eps)),
                   axis=axis)
