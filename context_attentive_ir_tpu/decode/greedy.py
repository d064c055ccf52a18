"""Greedy decoding as a jit-compiled ``lax.scan``.

Parity target: the reference's greedy argmax rollout used for fast
validation BLEU (SURVEY.md SS2.7).  The step function is the model's
``decode_step`` bound via ``model.apply(..., method=...)``; the whole
rollout is one scan with static ``max_len`` -- no Python-level token loop.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..constants import BOS, EOS, PAD
from ..ops.masking import NEG_INF

StepFn = Callable[..., tuple]  # (state, tokens) -> (state, logprobs [B, V])


def greedy_decode(step_fn: StepFn, init_state, batch_size: int,
                  max_len: int, min_length: int = 0,
                  early_exit: bool = False):
    """Returns (tokens [B, max_len], logprob_sum [B]).

    ``min_length`` forbids EOS before that many real tokens (the same
    contract as ``beam_search``'s, so a beam_size=1 run honours the
    configured ``min_decode_len``).

    ``early_exit`` wraps each scan step in a
    ``lax.cond(all(finished), identity, step)`` -- exact by
    construction: an all-finished real step emits PAD for every row and
    leaves ``total``/``finished`` unchanged (the decoder state it would
    advance is dead).  Default OFF here, ON at the trained-model
    surfaces (``serve.Engine``, ``train/evaluate.py``) -- see
    ``beam_search`` for the regime argument, the bf16-recompile
    near-tie caveat, and PERF.md r5 #8 for the measured numbers
    (greedy worst case +11%; trained models skip most of the budget).

    FUSED-GENERATOR mode (same contract as ``beam_search``'s): ``step_fn``
    may return ``(state, (vals [B, Kc], idx [B, Kc], lse [B]))`` -- the
    per-row top-Kc RAW scores descending, their vocab ids, and the row
    logsumexp, typically from ``ops.pallas.beamgen.generator_topk_lse``
    so the ``[B, V]`` logits never exist in HBM.  Requires ``Kc >= 2``:
    greedy blocks at most one token (EOS under ``min_length``), so the
    best unblocked token is always within the top-2 -- exact."""
    probe = step_fn(init_state, jnp.full((batch_size,), BOS, jnp.int32))
    topk_mode = isinstance(probe[1], (tuple, list))
    if topk_mode and probe[1][0].shape[-1] < 2:
        raise ValueError(
            "fused greedy step must provide at least 2 entries (one spare "
            f"slot for a blocked EOS), got {probe[1][0].shape[-1]}")

    def body(carry, t):
        state, tokens, finished, total = carry
        out = step_fn(state, tokens)
        state = out[0]
        if topk_mode:
            vals, idx, lse = out[1]
            vals = vals.astype(jnp.float32)
            lse = lse.astype(jnp.float32)
            if min_length > 0:
                block = (idx == EOS) & (t < min_length)
                vals = jnp.where(block, NEG_INF, vals)
            j = jnp.argmax(vals, axis=-1)
            next_tok = jnp.take_along_axis(
                idx, j[:, None], 1)[:, 0].astype(jnp.int32)
            step_lp = jnp.take_along_axis(vals, j[:, None], 1)[:, 0] - lse
            next_tok = jnp.where(finished, PAD, next_tok)
            total = total + jnp.where(finished, 0.0, step_lp)
            finished = finished | (next_tok == EOS)
            return (state, next_tok, finished, total), next_tok
        logp = out[1]                  # step may also return attention
        # steps may return raw logits (see decode/beam.py): normalize the
        # accumulated score with one logsumexp reduction (a no-op shift,
        # ~0, when the step already returns log-probs); computed BEFORE
        # any EOS block so the normalizer matches the model distribution
        lse = jax.scipy.special.logsumexp(
            logp.astype(jnp.float32), axis=-1)
        if min_length > 0:
            block = (jnp.arange(logp.shape[-1]) == EOS)[None, :] & (
                t < min_length)
            logp = jnp.where(block, NEG_INF, logp)
        next_tok = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        step_lp = jnp.max(logp, axis=-1).astype(jnp.float32) - lse
        next_tok = jnp.where(finished, PAD, next_tok)
        total = total + jnp.where(finished, 0.0, step_lp)
        finished = finished | (next_tok == EOS)
        return (state, next_tok, finished, total), next_tok

    def wrapped(carry, t):
        if not early_exit:
            return body(carry, t)

        def frozen(c):
            return c, jnp.full((batch_size,), PAD, jnp.int32)

        # carry[2] is ``finished``
        return jax.lax.cond(jnp.all(carry[2]), frozen,
                            lambda c: body(c, t), carry)

    bos = jnp.full((batch_size,), BOS, jnp.int32)
    fin = jnp.zeros((batch_size,), bool)
    tot = jnp.zeros((batch_size,), jnp.float32)
    (_, _, _, total), toks = jax.lax.scan(
        wrapped, (init_state, bos, fin, tot), jnp.arange(max_len))
    return jnp.swapaxes(toks, 0, 1), total
