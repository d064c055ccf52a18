"""Vocabulary generator head (optionally weight-tied).

The reference's decoder projects attentional hidden states to vocab logits;
CARS/M-NSRF share the projection with the embedding table when dims allow
(SURVEY.md SS2.3/SS2.6).  With ``tie=True`` the head projects H -> E and
multiplies by the (transposed) embedding table.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.layers import Embeddings


class Generator(nn.Module):
    vocab_size: int
    tie: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray,
                 embeddings: Embeddings | None = None,
                 project_only: bool = False) -> jnp.ndarray:
        """h [..., H] -> logits [..., V].

        ``project_only=True`` (tied generators only) returns the E-dim
        tie projection WITHOUT the ``[.., V]`` logits matmul -- the input
        to the fused Pallas beam-generator kernel
        (ops/pallas/beamgen.py), which streams the table matmul + top-k +
        logsumexp without materializing logits in HBM.
        """
        if self.tie and embeddings is not None:
            proj = nn.Dense(embeddings.features, dtype=self.dtype,
                            name="tie_proj")(h)
            if project_only:
                return proj
            return embeddings.attend(proj)
        if project_only:
            raise ValueError("project_only requires a tied generator")
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="proj")(h)
