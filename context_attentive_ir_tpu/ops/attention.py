"""Luong-style global attention with masking.

Parity target: ``neuroir/modules/global_attention.py`` (SURVEY.md SS2.3,
marker ``exp:``) -- OpenNMT-lineage GlobalAttention with ``dot`` /
``general`` / ``mlp`` score functions, returning the attentional hidden
state ``tanh(W [c; q])`` and the alignment distribution.

The whole-batch formulation is a single batched matmul per score type, which
XLA maps straight onto the MXU; no per-query loops.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .masking import masked_softmax


class GlobalAttention(nn.Module):
    dim: int
    attn_type: str = "general"   # 'dot' | 'general' | 'mlp'
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, memory: jnp.ndarray,
                 memory_mask: jnp.ndarray):
        """query [B, Tq, H] (or [B, H]), memory [B, S, H], mask bool [B, S].

        Returns (attn_h [B, Tq, H], align [B, Tq, S]); squeezes Tq if the
        query came in rank-2.
        """
        squeeze = query.ndim == 2
        if squeeze:
            query = query[:, None, :]
        q = query.astype(self.dtype)
        m = memory.astype(self.dtype)

        if self.attn_type == "general":
            q_proj = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                              param_dtype=self.param_dtype, name="linear_in")(q)
            scores = jnp.einsum("bth,bsh->bts", q_proj, m)
        elif self.attn_type == "dot":
            scores = jnp.einsum("bth,bsh->bts", q, m)
        elif self.attn_type == "mlp":
            wq = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="query_proj")(q)
            wm = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="memory_proj")(m)
            v = self.param("v", nn.initializers.glorot_uniform(),
                           (self.dim, 1), self.param_dtype)
            hidden = jnp.tanh(wq[:, :, None, :] + wm[:, None, :, :])
            scores = jnp.einsum("btsh,ho->bts", hidden,
                                v.astype(self.dtype))
        else:
            raise ValueError(f"unknown attn_type {self.attn_type}")

        align = masked_softmax(scores, memory_mask[:, None, :], axis=-1)
        context = jnp.einsum("bts,bsh->bth", align, m)
        concat = jnp.concatenate([context, q], axis=-1)
        attn_h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="linear_out")(concat)
        attn_h = jnp.tanh(attn_h)
        if squeeze:
            return attn_h[:, 0], align[:, 0]
        return attn_h, align


class AttentionPool(nn.Module):
    """Learned attention pooling of token states into one vector.

    Optionally conditioned on an external query vector (used by the CARS
    document encoder's query-aware pooling, SURVEY.md SS2.6).
    """

    dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, states: jnp.ndarray, mask: jnp.ndarray,
                 query: jnp.ndarray | None = None):
        """states [..., T, H], mask [..., T], query [..., H] -> [..., H]."""
        h = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="proj")(
                         states.astype(self.dtype))
        h = jnp.tanh(h)
        if query is not None:
            scores = jnp.einsum("...th,...h->...t", h,
                                query.astype(self.dtype))
        else:
            v = self.param("v", nn.initializers.glorot_uniform(),
                           (self.dim, 1), self.param_dtype)
            scores = jnp.einsum("...th,ho->...t", h,
                                v.astype(self.dtype))
        align = masked_softmax(scores, mask, axis=-1)
        return jnp.einsum("...t,...th->...h", align, states.astype(self.dtype))
