"""Masking primitives shared by every model.

Parity target: ``sequence_mask`` / masked-softmax utilities in the
reference's ``neuroir/modules/util_class.py`` and ``neuroir/utils/misc.py``
(SURVEY.md SS2.3, marker ``exp:``).

All helpers are shape-preserving and jit-safe: masks are bool arrays, no
data-dependent shapes.  ``NEG_INF`` is finite so bf16/f16 softmaxes stay
NaN-free even for fully-masked rows.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e9


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """bool [..., max_len] with True for positions < length."""
    pos = jnp.arange(max_len)
    return pos[None, :] < lengths[..., None]


def mask_logits(logits: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Set masked-out logits to a large negative value."""
    return jnp.where(mask, logits, NEG_INF)


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray,
                   axis: int = -1) -> jnp.ndarray:
    """Softmax over valid positions; fully-masked rows return zeros."""
    logits = mask_logits(logits, mask)
    logits = logits - jnp.max(logits, axis=axis, keepdims=True)
    unnorm = jnp.exp(logits) * mask.astype(logits.dtype)
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return unnorm / jnp.maximum(denom, 1e-13)


def masked_log_softmax(logits: jnp.ndarray, mask: jnp.ndarray,
                       axis: int = -1) -> jnp.ndarray:
    return jnp.log(jnp.maximum(masked_softmax(logits, mask, axis), 1e-13))


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray,
                axis: int = -2) -> jnp.ndarray:
    """Mean of ``x`` over ``axis`` counting only positions where mask=True.

    ``mask`` must broadcast against ``x`` with a trailing feature axis, e.g.
    x [B, T, D], mask [B, T] -> [B, D].
    """
    m = mask[..., None].astype(x.dtype)
    total = jnp.sum(x * m, axis=axis)
    count = jnp.maximum(jnp.sum(m, axis=axis), 1.0)
    return total / count


def masked_max(x: jnp.ndarray, mask: jnp.ndarray,
               axis: int = -2) -> jnp.ndarray:
    m = mask[..., None]
    return jnp.max(jnp.where(m, x, NEG_INF), axis=axis)
