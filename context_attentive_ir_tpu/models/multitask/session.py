"""Session-level building blocks shared by the multitask models.

The reference runs a Python/torch loop over session positions
(SURVEY.md SS3.2 "for t in 1..S ... a Python/torch loop in the reference").
Here the session axis is handled TPU-first:

- sequential parts (query-flow / click-flow recurrences) are short
  ``lax.scan``s over S (via ``ops.rnn.RNNLayer`` on the turn axis);
- the *context attention over previous turns* is ONE causally-masked
  attention einsum over the whole session -- exact because the attention
  output does not feed back into the recurrence -- instead of S separate
  attention calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.masking import masked_softmax


def causal_turn_mask(turn_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, S] -> [B, S, S] mask where position t sees turns strictly < t."""
    S = turn_mask.shape[-1]
    tri = jnp.tril(jnp.ones((S, S), bool), k=-1)
    return tri[None] & turn_mask[:, None, :]


class ContextAttention(nn.Module):
    """CARS-style attention over previous in-session states with a gate.

    Given per-turn representations ``states [B, S, H]`` (the attention
    memory: query-flow and/or click-flow states) and the current query
    representations ``query [B, S, H]``, computes for every turn t a context
    vector from turns < t and gates it with the current representation:

        e_tj   = v^T tanh(Wq q_t + Wm m_j)          (j < t)
        c_t    = sum_j softmax(e_t)_j m_j
        g_t    = sigmoid(Wg [q_t; c_t])
        out_t  = g_t * q_t + (1 - g_t) * c_t

    Turn 0 has no context: the gate collapses to the raw query repr
    (fully-masked softmax yields c_0 = 0 and we force g_0 = 1).
    """

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jnp.ndarray, states: jnp.ndarray,
                 turn_mask: jnp.ndarray):
        q = nn.Dense(self.dim, dtype=self.dtype, name="wq")(query)
        m = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     name="wm")(states)
        v = self.param("v", nn.initializers.glorot_uniform(),
                       (self.dim, 1), jnp.float32)
        scores = jnp.einsum("btsh,ho->bts",
                            jnp.tanh(q[:, :, None, :] + m[:, None, :, :]),
                            v.astype(self.dtype))
        cmask = causal_turn_mask(turn_mask)
        align = masked_softmax(scores, cmask, axis=-1)      # [B, S, S]
        context = jnp.einsum("bts,bsh->bth", align, states)
        gate_in = jnp.concatenate([query, context], axis=-1)
        g = jax.nn.sigmoid(nn.Dense(query.shape[-1], dtype=self.dtype,
                                    name="wg")(gate_in))
        has_ctx = cmask.any(axis=-1)[..., None].astype(query.dtype)
        g = g * has_ctx + (1.0 - has_ctx)   # turn 0: pure query repr
        return g * query + (1.0 - g) * context, align
