"""Beam-search penalties.

Parity target: the reference's OpenNMT-style ``translator/penalties.py``
(SURVEY.md SS2.7, marker ``exp:``): Wu et al. (GNMT) and average length
penalties, Wu and summary coverage penalties.  In practice the reference
only exercises the length penalty; coverage is kept for full surface
parity and is applied by ``beam_search`` when the step function exposes
attention weights.

All functions are jit-friendly (pure jnp, static shapes).
"""

from __future__ import annotations

import jax.numpy as jnp


def length_wu(lengths: jnp.ndarray, alpha: float = 0.6) -> jnp.ndarray:
    """GNMT length normalizer ((5 + len) / 6)^alpha (Wu et al. 2016)."""
    return jnp.power((5.0 + lengths.astype(jnp.float32)) / 6.0, alpha)


def length_average(lengths: jnp.ndarray, alpha: float = 0.0) -> jnp.ndarray:
    """Plain per-token average."""
    del alpha
    return jnp.maximum(lengths.astype(jnp.float32), 1.0)


def length_none(lengths: jnp.ndarray, alpha: float = 0.0) -> jnp.ndarray:
    """Raw cumulative log-prob (no normalization)."""
    del alpha
    return jnp.ones_like(lengths, jnp.float32)


LENGTH_PENALTIES = {
    "wu": length_wu,
    "avg": length_average,
    "none": length_none,
}


def coverage_wu(coverage: jnp.ndarray, mask: jnp.ndarray,
                beta: float = 0.0) -> jnp.ndarray:
    """GNMT coverage penalty: beta * sum_j log(min(cov_j, 1)).

    coverage [..., L] is the attention mass accumulated per source
    position; mask [..., L] marks real source tokens.  Returns a value to
    ADD to the hypothesis score (it is <= 0: hypotheses that ignore source
    tokens are penalized).
    """
    cov = jnp.clip(coverage, 1e-6, 1.0)
    logs = jnp.log(cov) * mask.astype(coverage.dtype)
    return beta * jnp.sum(logs, axis=-1)


def coverage_summary(coverage: jnp.ndarray, mask: jnp.ndarray,
                     beta: float = 0.0) -> jnp.ndarray:
    """OpenNMT 'summary' coverage: -beta * (sum_j max(cov_j, 1) - L)."""
    m = mask.astype(coverage.dtype)
    over = jnp.sum(jnp.maximum(coverage, 1.0) * m, axis=-1) - jnp.sum(
        m, axis=-1)
    return -beta * over


COVERAGE_PENALTIES = {
    "wu": coverage_wu,
    "summary": coverage_summary,
}

__all__ = [
    "LENGTH_PENALTIES", "COVERAGE_PENALTIES",
    "length_wu", "length_average", "length_none",
    "coverage_wu", "coverage_summary",
]
