"""Luong-style global attention with masking.

Parity target: ``neuroir/modules/global_attention.py`` (SURVEY.md SS2.3,
marker ``exp:``) -- OpenNMT-lineage GlobalAttention with ``dot`` /
``general`` / ``mlp`` score functions, returning the attentional hidden
state ``tanh(W [c; q])`` and the alignment distribution.

The whole-batch formulation is a single batched matmul per score type, which
XLA maps straight onto the MXU; no per-query loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
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
        # OpenNMT-lineage convention (the parity target): the output
        # projection carries a bias ONLY for 'mlp', and tanh is applied
        # ONLY for 'dot'/'general' (Bahdanau-style mlp output is linear)
        attn_h = nn.Dense(self.dim, use_bias=self.attn_type == "mlp",
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="linear_out")(concat)
        if self.attn_type != "mlp":
            attn_h = jnp.tanh(attn_h)
        if squeeze:
            return attn_h[:, 0], align[:, 0]
        return attn_h, align


class AttentionPool(nn.Module):
    """Learned attention pooling of token states into one vector.

    Optionally conditioned on an external query vector (used by the CARS
    document encoder's query-aware pooling, SURVEY.md SS2.6).

    ``use_pallas=True`` dispatches the query-conditioned form to the fused
    slate-interaction kernel (``ops/pallas/slate.py``) on TPU when the
    feature dim is 128-aligned.  Measured on v5e the kernel LOSES to XLA
    (the cost is intrinsic tanh/VPU work, not HBM traffic -- PERF.md
    round-2 ledger), so it defaults off; it is kept correct and
    parity-tested as the second kernel family's measured negative result.

    The serving-relevant decomposition instead: ``tanh(states @ W_p +
    b_p)`` does not depend on the query, so cached-document ranking
    precomputes it per corpus (``proj_only=True`` at index time,
    ``proj_states=...`` at query time) and pays only score + softmax +
    weighted-sum per request (serve.py DocIndex).
    """

    dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    def _pallas_ok(self, states: jnp.ndarray, query) -> bool:
        if not (self.use_pallas and query is not None):
            return False
        if jax.default_backend() != "tpu":
            return False
        if states.shape[-1] != self.dim:
            return False
        from .pallas.slate import pool_supported

        rows = int(np.prod(states.shape[:-2]))
        return pool_supported(self.dim, rows)

    @nn.compact
    def __call__(self, states: jnp.ndarray, mask: jnp.ndarray | None = None,
                 query: jnp.ndarray | None = None,
                 proj_states: jnp.ndarray | None = None,
                 proj_only: bool = False):
        """states [..., T, H], mask [..., T], query [..., H] -> [..., H].

        ``proj_only=True``: return the query-independent projection
        ``tanh(states @ W_p + b_p)`` (for doc-index caching).
        ``proj_states``: reuse such a cached projection, skipping the
        matmul + tanh.
        """
        D = states.shape[-1]
        w_p = self.param("proj_kernel", nn.initializers.glorot_uniform(),
                         (D, self.dim), self.param_dtype)
        b_p = self.param("proj_bias", nn.initializers.zeros,
                         (self.dim,), self.param_dtype)
        s = states.astype(self.dtype)
        wp_c = w_p.astype(self.dtype)
        bp_c = b_p.astype(self.dtype)
        if proj_only:
            return jnp.tanh(s @ wp_c + bp_c)
        if proj_states is None and self._pallas_ok(states, query):
            from .pallas.slate import attn_pool_pallas

            lead, T = states.shape[:-2], states.shape[-2]
            out = attn_pool_pallas(
                s.reshape(-1, T, D), mask.reshape(-1, T),
                query.astype(self.dtype).reshape(-1, D), wp_c, bp_c)
            return out.reshape(lead + (D,))
        if proj_states is None:
            h = jnp.tanh(s @ wp_c + bp_c)
        else:
            h = proj_states.astype(self.dtype)
        if query is not None:
            scores = jnp.einsum("...th,...h->...t", h,
                                query.astype(self.dtype))
        else:
            v = self.param("v", nn.initializers.glorot_uniform(),
                           (self.dim, 1), self.param_dtype)
            scores = jnp.einsum("...th,ho->...t", h,
                                v.astype(self.dtype))
        align = masked_softmax(scores, mask, axis=-1)
        return jnp.einsum("...t,...th->...h", align, s)
