"""Training objectives.

Parity targets (SURVEY.md SS2.4-SS2.6): listwise softmax cross-entropy
against click labels (the M-NSRF / CARS ranking loss), pairwise hinge and
pointwise BCE variants for the classic rankers, and token-level NLL for the
suggestion decoders.  All losses are fully masked (padded candidates, padded
target tokens, padded rows) so the same compiled function handles every batch
including the short final one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.masking import masked_log_softmax


def listwise_rank_loss(scores: jnp.ndarray, labels: jnp.ndarray,
                       cand_mask: jnp.ndarray,
                       row_mask: jnp.ndarray) -> jnp.ndarray:
    """-sum_d y_d log softmax(scores)_d with multi-click label normalization.

    scores/labels/cand_mask: [..., N]; row_mask: [...].  Rows without any
    click contribute zero.  Returns the mean over valid rows.
    """
    logp = masked_log_softmax(scores, cand_mask)
    y = labels * cand_mask.astype(labels.dtype)
    y_sum = jnp.sum(y, axis=-1, keepdims=True)
    y_norm = y / jnp.maximum(y_sum, 1.0)
    per_row = -jnp.sum(y_norm * logp, axis=-1)
    valid = row_mask.astype(scores.dtype) * (y_sum[..., 0] > 0)
    return jnp.sum(per_row * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def pairwise_hinge_loss(scores: jnp.ndarray, labels: jnp.ndarray,
                        cand_mask: jnp.ndarray, row_mask: jnp.ndarray,
                        margin: float = 1.0) -> jnp.ndarray:
    """max(0, margin - s_pos + s_neg) over all (pos, neg) pairs per row."""
    pos = (labels > 0) & cand_mask
    neg = (labels <= 0) & cand_mask
    diff = margin - scores[..., :, None] + scores[..., None, :]
    pair_mask = (pos[..., :, None] & neg[..., None, :]).astype(scores.dtype)
    pair_mask = pair_mask * row_mask[..., None, None].astype(scores.dtype)
    loss = jnp.maximum(diff, 0.0) * pair_mask
    return jnp.sum(loss) / jnp.maximum(jnp.sum(pair_mask), 1.0)


def pointwise_bce_loss(scores: jnp.ndarray, labels: jnp.ndarray,
                       cand_mask: jnp.ndarray,
                       row_mask: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_sigmoid(scores)
    log1mp = jax.nn.log_sigmoid(-scores)
    per = -(labels * logp + (1.0 - labels) * log1mp)
    m = cand_mask.astype(scores.dtype) * row_mask[..., None].astype(scores.dtype)
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


def rank_loss(loss_type: str, scores, labels, cand_mask, row_mask,
              margin: float = 1.0) -> jnp.ndarray:
    if loss_type == "listwise":
        return listwise_rank_loss(scores, labels, cand_mask, row_mask)
    if loss_type == "pairwise":
        return pairwise_hinge_loss(scores, labels, cand_mask, row_mask, margin)
    if loss_type == "pointwise":
        return pointwise_bce_loss(scores, labels, cand_mask, row_mask)
    raise ValueError(f"unknown loss_type {loss_type!r}")


def sequence_nll_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                      target_mask: jnp.ndarray,
                      label_smoothing: float = 0.0) -> jnp.ndarray:
    """Token-level NLL over teacher-forced decoder logits.

    logits [..., T, V], targets int [..., T], mask bool [..., T].
    Mean over valid tokens (the reference averages per token).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt_logp = jnp.take_along_axis(logp, targets[..., None],
                                   axis=-1)[..., 0]
    if label_smoothing > 0:
        smooth = jnp.mean(logp, axis=-1)
        tgt_logp = (1 - label_smoothing) * tgt_logp + label_smoothing * smooth
    m = target_mask.astype(logits.dtype)
    return -jnp.sum(tgt_logp * m) / jnp.maximum(jnp.sum(m), 1.0)


def copy_generator_nll_loss(gen_probs: jnp.ndarray,
                            targets: jnp.ndarray,
                            target_mask: jnp.ndarray) -> jnp.ndarray:
    """NLL over mixed generate+copy *probabilities* (already normalized).

    gen_probs [..., T, V]: final per-token distributions (see
    models/recommenders/acg.py).
    """
    p = jnp.take_along_axis(gen_probs, targets[..., None], axis=-1)[..., 0]
    logp = jnp.log(jnp.maximum(p, 1e-10))
    m = target_mask.astype(gen_probs.dtype)
    return -jnp.sum(logp * m) / jnp.maximum(jnp.sum(m), 1.0)


__all__ = [
    "listwise_rank_loss", "pairwise_hinge_loss", "pointwise_bce_loss",
    "rank_loss", "sequence_nll_loss", "copy_generator_nll_loss",
]
