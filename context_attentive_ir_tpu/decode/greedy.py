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

StepFn = Callable[..., tuple]  # (state, tokens) -> (state, logprobs [B, V])


def greedy_decode(step_fn: StepFn, init_state, batch_size: int,
                  max_len: int):
    """Returns (tokens [B, max_len], logprob_sum [B])."""

    def body(carry, _):
        state, tokens, finished, total = carry
        out = step_fn(state, tokens)
        state, logp = out[0], out[1]   # step may also return attention
        next_tok = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        # steps may return raw logits (see decode/beam.py): normalize the
        # accumulated score with one logsumexp reduction (a no-op shift,
        # ~0, when the step already returns log-probs)
        lse = jax.scipy.special.logsumexp(
            logp.astype(jnp.float32), axis=-1)
        step_lp = jnp.max(logp, axis=-1).astype(jnp.float32) - lse
        next_tok = jnp.where(finished, PAD, next_tok)
        total = total + jnp.where(finished, 0.0, step_lp)
        finished = finished | (next_tok == EOS)
        return (state, next_tok, finished, total), next_tok

    bos = jnp.full((batch_size,), BOS, jnp.int32)
    fin = jnp.zeros((batch_size,), bool)
    tot = jnp.zeros((batch_size,), jnp.float32)
    (_, _, _, total), toks = jax.lax.scan(
        body, (init_state, bos, fin, tot), None, length=max_len)
    return jnp.swapaxes(toks, 0, 1), total
