"""Beam search as a pure-functional jit-compiled scan.

Parity target: the reference's OpenNMT-style beam with length penalty and
n-best output (SURVEY.md SS2.7, marker ``exp:`` for
``neuroir/translator/{beam.py,penalties.py}``; BASELINE.json:5 "seq2seq
query-suggestion decoder (with beam search)").

TPU-first redesign (SURVEY.md SS7 hard part (b)): beam state is a PyTree of
static-shape arrays ``[B*K, ...]``; each step is (per-beam top-(K+1) over
the raw scores -> combine over [B, K*(K+1)] -> gather), all static shapes;
beam reordering is a ``jnp.take`` over the flattened beam axis applied
uniformly to the whole decoder-state pytree.  Finished beams are frozen by
forcing PAD continuations with zero added log-prob.  GNMT length penalty
``((5+len)/6)^alpha`` ranks hypotheses.

Step functions may return RAW logits: normalization happens in-loop via a
single logsumexp reduction applied to the per-beam top values (an exact,
rank-preserving shift), so no ``[B*K, V]`` log-softmax or masked
``[B, K, V]`` total is ever materialized -- measured 5x cheaper per beam
step than the flat ``top_k(K*V)`` formulation on v5e (PERF.md round-2).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..constants import BOS, EOS, PAD
from ..ops.masking import NEG_INF
from .penalties import COVERAGE_PENALTIES, LENGTH_PENALTIES

# (state, tokens [B*K]) -> (state, logp [B*K, V]) or
#                          (state, logp [B*K, V], attn [B*K, L])
StepFn = Callable[..., tuple]


def _tile_beam(tree, beam_size: int):
    """Tile every leaf [B, ...] -> [B*K, ...] (beam-major within batch)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, beam_size, axis=0), tree)


def _gather_beams(tree, parent: jnp.ndarray, batch_size: int,
                  beam_size: int):
    """Reindex leaves [B*K, ...] by parent beam ids [B, K] (gather)."""
    offsets = jnp.arange(batch_size)[:, None] * beam_size
    flat_idx = (parent + offsets).reshape(-1)
    return jax.tree_util.tree_map(
        lambda x: jnp.take(x, flat_idx, axis=0), tree)


def _select_slots(x: jnp.ndarray, parent: jnp.ndarray):
    """``x[b, parent[b, k], ...]`` as a one-hot select+sum (no gather op).

    ``x [B, K, ...]``, ``parent [B, K]`` -> ``[B, K, ...]``.  A beam
    reorder is a within-group permutation-with-repeats over K <= ~10
    slots; expressing it as ``sum_j where(parent==j, x_j, 0)`` compiles
    to a fused VPU select-reduce (reads each source row K times) instead
    of a row-gather, whose per-descriptor DMA cost dominates at these
    sizes (PERF.md r3 ledger #7: ~34 ns/row).  Exact for every dtype --
    no arithmetic touches the selected values.
    """
    K = x.shape[1]
    hot = parent[..., None] == jnp.arange(K, dtype=parent.dtype)  # [B,K,K]
    hot = hot.reshape(hot.shape + (1,) * (x.ndim - 2))
    zero = jnp.zeros((), x.dtype)
    return jnp.where(hot, x[:, None], zero).sum(axis=2).astype(x.dtype)


def _select_beam_tree(tree, parent: jnp.ndarray, batch_size: int,
                      beam_size: int):
    """``_gather_beams`` semantics via ``_select_slots`` on every leaf."""
    def sel(x):
        xs = x.reshape((batch_size, beam_size) + x.shape[1:])
        return _select_slots(xs, parent).reshape(x.shape)

    return jax.tree_util.tree_map(sel, tree)


def _iter_topk(flat: jnp.ndarray, payload: jnp.ndarray, k: int):
    """Exact top-``k`` over the last axis of ``flat [B, C]`` by ``k``
    masked max/min reduction passes -- the same selection loop the
    beamgen kernel runs in VMEM (ops/pallas/beamgen.py), here replacing
    XLA's sort-based ``lax.top_k`` for the tiny [B, K*(K+1)] beam merge.

    Matches ``lax.top_k`` tie semantics exactly (descending values,
    ties broken by ascending index): each pass takes the row max over
    not-yet-taken lanes and retires the smallest-index hit.  Retirement
    is a boolean ``taken`` mask rather than overwriting the lane with a
    finite sentinel -- genuine lane values can sit below any finite
    sentinel (e.g. ``NEG_INF + logp`` accumulations on dead beams), and
    a sentinel would then let a retired lane win again, emitting a
    duplicate index where ``lax.top_k`` returns distinct ones.
    ``payload [B, C]`` rides along -- the winning lane's payload is
    extracted by the same one-hot mask, so the caller needs no
    follow-up ``take_along_axis``.  Returns
    ``(vals [B, k], idx [B, k] i32, pay [B, k])``.

    Sole divergence from ``lax.top_k``: ``-0.0`` vs ``+0.0`` ties
    (top_k's total order ranks ``+0.0`` higher; ``==`` treats them
    equal, so this picks the lower index).  Beam totals are sums of
    log-probs, where a signed-zero tie between DISTINCT lanes means two
    exactly-equal-scored hypotheses -- either pick is a correct beam.
    """
    C = flat.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 1)
    ninf = jnp.array(-jnp.inf, flat.dtype)
    taken = jnp.zeros(flat.shape, bool)
    vals, idxs, pays = [], [], []
    for _ in range(k):
        live = jnp.where(taken, ninf, flat)
        m = jnp.max(live, -1, keepdims=True)
        # ``& ~taken`` matters only when m == -inf (all remaining lanes
        # -inf): retired lanes also read -inf in ``live`` and would tie
        ci = jnp.min(jnp.where((live == m) & ~taken, col, C), -1,
                     keepdims=True)
        sel = col == ci
        pays.append(jnp.sum(jnp.where(sel, payload, 0), -1, keepdims=True))
        taken = taken | sel
        vals.append(m)
        idxs.append(ci)
    return (jnp.concatenate(vals, -1), jnp.concatenate(idxs, -1),
            jnp.concatenate(pays, -1))


def _reconstruct_seqs(toks: jnp.ndarray, parents: jnp.ndarray):
    """Rebuild ``[B, K, T]`` sequences from per-step ``(token [B, K],
    backpointer [B, K])`` pairs by one reverse scan.

    The in-loop alternative -- reorder + scatter of the full
    ``[B, K, max_len]`` buffer every step -- is what the legacy
    bookkeeping carries; the backpointer chain moves that work out of
    the hot loop into T tiny [B, K] selects (part of the measured
    +2.3% fused-bookkeeping win, PERF.md r4 #7; it also shrinks the
    scan carry).
    Emitted tokens are already PAD on frozen beams (``i1`` is masked to
    PAD before the merge), so no finished-mask is needed here.
    Bit-identical to the carried buffer by induction on the chain.
    """
    def back(cur, xs):
        tok_t, par_t = xs
        return _select_slots(par_t, cur), _select_slots(tok_t, cur)

    B, K = toks.shape[1], toks.shape[2]
    k0 = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None], (B, 1))
    _, rev = jax.lax.scan(back, k0, (toks, parents), reverse=True)
    return jnp.moveaxis(rev, 0, 2)


def _resolve_bookkeeping(method: str, rows: int, k: int) -> str:
    """Resolve ``auto`` at trace time via the on-chip-measured dispatch
    table (ops/dispatch.py, same policy as the RNN and top-k choices):
    the sort-free/gather-free bookkeeping only on TPU and only where
    measured faster; the ``lax.top_k`` + gather formulation elsewhere
    and for every unmeasured shape.  Both are bit-identical."""
    if method != "auto":
        return method
    if jax.default_backend() != "tpu":
        return "legacy"
    from ..ops.dispatch import prefer_fused_bookkeeping

    return "fused" if prefer_fused_bookkeeping(rows, k) else "legacy"


def _chunk_count(v: int, kc: int) -> int:
    """Largest G <= 32 with G | V and V/G >= 4*Kc (0 if none)."""
    for g in range(32, 1, -1):
        if v % g == 0 and v // g >= 4 * kc:
            return g
    return 0


def _resolve_topk_method(method: str, v: int, kc: int) -> str:
    """Resolve ``auto`` at trace time via the on-chip-measured dispatch
    table (ops/dispatch.py, same policy as the RNN kernel-vs-scan choice):
    chunked only on TPU and only where measured faster; exact elsewhere
    and for every unmeasured shape.  Both choices are bit-identical."""
    if method != "auto":
        return method
    if jax.default_backend() != "tpu":
        return "exact"
    from ..ops.dispatch import prefer_chunked_topk

    return "chunked" if prefer_chunked_topk(v, kc) else "exact"


def _topk_rows(scores: jnp.ndarray, kc: int, method: str):
    """Top-``kc`` of each row of ``[R, V]``.

    ``exact``: one ``lax.top_k`` over the full vocab axis (reference
    semantics, the baseline).  ``chunked``: exact two-stage -- top-kc
    within each of G vocab chunks, then top-kc over the G*kc chunk
    winners.  Exact because every global top-kc element is necessarily
    within its own chunk's top-kc; dispatched where measured faster
    on-chip (PERF.md round-3 ledger).  ``approx``: TPU ``approx_max_k``
    (PartialReduce), recall ~0.99 per element -- opt-in, NOT used by
    default since decoded output is no longer bit-identical to the
    reference beam.  ``auto`` (the production default): measured dispatch
    between the two exact formulations.
    """
    method = _resolve_topk_method(method, scores.shape[-1], kc)
    if method == "chunked":
        v = scores.shape[-1]
        g = _chunk_count(v, kc)
        if g:
            r = scores.shape[0]
            vc = v // g
            tc, ic = jax.lax.top_k(scores.reshape(r * g, vc), kc)
            cand = tc.reshape(r, g * kc)
            base = (jnp.arange(g, dtype=jnp.int32) * vc)[None, :, None]
            gid = (ic.reshape(r, g, kc) + base).reshape(r, g * kc)
            t1, sel = jax.lax.top_k(cand, kc)
            return t1, jnp.take_along_axis(gid, sel, axis=1)
        method = "exact"
    if method == "approx":
        return jax.lax.approx_max_k(scores, kc, recall_target=0.99)
    return jax.lax.top_k(scores, kc)


def beam_search(step_fn: StepFn, init_state, batch_size: int, max_len: int,
                beam_size: int = 5, alpha: float = 0.6,
                return_nbest: bool = False,
                min_length: int = 0, length_penalty: str = "wu",
                coverage_beta: float = 0.0, coverage_penalty: str = "wu",
                cov_mask: jnp.ndarray | None = None,
                topk_method: str = "auto", bookkeeping: str = "auto",
                early_exit: bool = False):
    """Returns (best tokens [B, max_len], best score [B]); with
    ``return_nbest`` instead returns the full beams ([B, K, max_len],
    [B, K]) sorted by normalized score -- the reference beam's n-best
    output (SURVEY.md SS2.7).

    ``step_fn`` operates on a flattened ``[B*K]`` beam batch;
    ``init_state`` holds ``[B, ...]`` leaves and is tiled here.  It may
    return ``(state, logp)`` or ``(state, logp, attn [B*K, L])``; with
    attention exposed and ``coverage_beta > 0``, accumulated coverage is
    penalized at ranking time (reference penalties.py parity).
    ``cov_mask [B, L]`` marks real source positions for the coverage term.
    ``min_length`` forbids EOS before that many real tokens.

    FUSED-GENERATOR mode: ``step_fn`` may instead return ``(state,
    (vals [B*K, Kc], idx [B*K, Kc], lse [B*K]))`` -- the per-row top-Kc
    RAW scores, their vocab indices, and the row logsumexp, typically
    from ``ops.pallas.beamgen.generator_topk_lse`` so the ``[B*K, V]``
    logits never exist in HBM (VERDICT r3 next-round #3).  Requires
    ``Kc >= K + 1`` (same exactness argument as the per-beam top-(K+1)
    below) and is detected from the probe's structure; coverage
    penalties need full-attn steps and stay on the logits mode.

    ``bookkeeping`` selects the per-step beam-logic formulation --
    ``legacy`` (``lax.top_k`` merge + row-gather reorders + carried
    sequence buffer) or ``fused`` (iterative masked-max merge with the
    token payload riding along, one-hot select+sum reorders, and
    post-scan backpointer sequence reconstruction).  Both are
    bit-identical; ``auto`` consults the on-chip-measured dispatch
    table (the fused form measured +2.3% end-to-end at the bench shape;
    the step is generator-bound, bookkeeping ~0 -- PERF.md r4 #6/#7).

    ``early_exit`` wraps each scan step in a
    ``lax.cond(all(finished), identity, step)``: once every beam of
    every batch row is frozen the remaining steps skip the generator /
    model work entirely.  Exact by construction: beam totals are
    sorted descending after every merge (``top_k`` / ``_iter_topk``
    return descending, ties to the lower index), so an all-finished
    step's merge provably reduces to ``parent == arange(K)`` with PAD
    continuations at zero added log-prob -- the identity the skip
    branch emits.  Decoder state diverges (the real step would advance
    it on PAD inputs) but is dead past the last live step.  The win is
    decode-length-dependent, so the default is OFF at this raw API and
    ON at the trained-model surfaces (``serve.Engine``,
    ``train/evaluate.py``): trained next-query models emit EOS after
    ~3-5 tokens of a ``max_len``-step budget, while a decode that never
    finishes (e.g. random-init params) only pays for the cond --
    measured +5.4% on the bench beam-5 shape (PERF.md r5 #8).  One
    caveat measured there: toggling the flag recompiles the program,
    and at bf16 XLA may fuse the *step arithmetic* differently across
    the two programs -- on near-tie logits (random-init models) that
    can flip an argmax even though the early-exit logic itself is
    exact (fused-generator beam: 0 token mismatches on-chip; XLA-step
    greedy at random init: 69/320 rows; f32: bit-identical always).
    """
    B, K = batch_size, beam_size
    state = _tile_beam(init_state, K)

    # probe the step signature once at trace time (XLA dead-code-eliminates
    # the unused probe computation)
    probe = step_fn(state, jnp.full((B * K,), BOS, jnp.int32))
    topk_mode = isinstance(probe[1], (tuple, list))
    has_attn = (not topk_mode) and len(probe) == 3
    if topk_mode and probe[1][0].shape[-1] < K + 1:
        raise ValueError(
            f"fused step must provide at least K+1={K + 1} entries, got "
            f"{probe[1][0].shape[-1]} (exactness needs one spare slot for "
            "a blocked EOS, like the per-beam top-(K+1))")

    use_fused_bk = _resolve_bookkeeping(bookkeeping, B * K, K) == "fused"

    tokens = jnp.full((B, K), BOS, jnp.int32)
    # only beam 0 is live initially so the first top-k doesn't pick K copies
    logps = jnp.tile(jnp.array([0.0] + [NEG_INF] * (K - 1)), (B, 1))
    finished = jnp.zeros((B, K), bool)
    lengths = jnp.zeros((B, K), jnp.int32)
    seqs = jnp.full((B, K, max_len), PAD, jnp.int32)

    def live(carry, t):
        if use_fused_bk:
            state, tokens, logps, finished, lengths, cov = carry
        else:
            state, tokens, logps, finished, lengths, seqs, cov = carry
        out = step_fn(state, tokens.reshape(B * K))
        state = out[0]
        if topk_mode:
            # fused-generator step: top-Kc raw scores + logsumexp arrive
            # precomputed (the [B*K, V] logits never materialized)
            t1, i1, lse = out[1]
            Kc = t1.shape[-1]
            t1 = t1.astype(jnp.float32)
            lse = lse.astype(jnp.float32)[:, None]
        else:
            scores = out[1]
            V = scores.shape[-1]
            # Per-beam top-(K+1) FIRST, then all beam logic on [B, K, K+1]
            # arrays: the flat [B, K*V] top-k and the full-vocab masking
            # passes were ~85% of measured beam step time on TPU (PERF.md
            # round-2 ledger).  Exact: any flat-top-K winner is within its
            # beam's top-(K+1) even with the (single) EOS token blocked,
            # and normalization is a rank-preserving shift applied
            # afterwards via logsumexp -- so step functions may return RAW
            # logits (already-normalized log-probs also work; their
            # logsumexp is ~0).
            Kc = min(K + 1, V)
            scores32 = scores.astype(jnp.float32)
            lse = jax.scipy.special.logsumexp(scores32, axis=-1,
                                              keepdims=True)  # [B*K, 1]
            t1, i1 = _topk_rows(scores32, Kc, topk_method)    # [B*K, Kc]
        logp_top = (t1 - lse).reshape(B, K, Kc)
        i1 = i1.reshape(B, K, Kc).astype(jnp.int32)
        # frozen beams: single live continuation (PAD at zero cost)
        pad_row = jnp.full((Kc,), NEG_INF).at[0].set(0.0)
        logp_top = jnp.where(finished[..., None],
                             pad_row[None, None, :], logp_top)
        i1 = jnp.where(finished[..., None], PAD, i1)
        if min_length > 0:
            block = (i1 == EOS) & (t < min_length) & ~finished[..., None]
            logp_top = jnp.where(block, NEG_INF, logp_top)
        total = logps[..., None] + logp_top                   # [B, K, Kc]
        flat = total.reshape(B, K * Kc)
        if use_fused_bk:
            # sort-free merge; the winning token rides along as payload
            top_logp, top_idx, tok = _iter_topk(
                flat, i1.reshape(B, K * Kc), K)               # [B, K] x3
            parent = top_idx // Kc
            state = _select_beam_tree(state, parent, B, K)
            take = lambda x: _select_slots(x, parent)
        else:
            top_logp, top_idx = jax.lax.top_k(flat, K)        # [B, K]
            parent = top_idx // Kc
            tok = jnp.take_along_axis(i1.reshape(B, K * Kc), top_idx,
                                      axis=1)
            state = _gather_beams(state, parent, B, K)
            take = lambda x: jnp.take_along_axis(x, parent, axis=1)
        finished_p = take(finished)
        lengths_p = take(lengths)
        still = ~finished_p
        lengths_n = lengths_p + still.astype(jnp.int32)
        finished_n = finished_p | (tok == EOS)
        if cov is not None:
            attn = out[2].reshape(B, K, -1)
            cov_p = (_select_slots(cov, parent) if use_fused_bk else
                     jnp.take_along_axis(cov, parent[..., None], axis=1))
            cov = cov_p + attn * still[..., None].astype(attn.dtype)
        if use_fused_bk:
            # sequences are NOT carried: emit (token, backpointer) and
            # rebuild after the scan instead of reordering + scattering
            # the [B, K, max_len] buffer every step
            return (state, tok, top_logp, finished_n, lengths_n,
                    cov), (tok, parent)
        seqs_p = jnp.take_along_axis(seqs, parent[..., None], axis=1)
        seqs_n = seqs_p.at[:, :, t].set(jnp.where(still, tok, PAD))
        return (state, tok, top_logp, finished_n, lengths_n, seqs_n,
                cov), None

    def body(carry, t):
        if not early_exit:
            return live(carry, t)

        def frozen(c):
            # the identity an all-finished live step provably computes:
            # PAD continuations, parent == arange (totals stay sorted)
            ys = ((jnp.full((B, K), PAD, jnp.int32),
                   jnp.tile(jnp.arange(K, dtype=jnp.int32)[None], (B, 1)))
                  if use_fused_bk else None)
            return c, ys

        # carry[3] is ``finished`` in both bookkeeping layouts
        return jax.lax.cond(jnp.all(carry[3]), frozen,
                            lambda c: live(c, t), carry)

    cov0 = None
    if has_attn and coverage_beta > 0:
        cov0 = jnp.zeros((B, K, probe[2].shape[-1]), jnp.float32)
    if use_fused_bk:
        carry = (state, tokens, logps, finished, lengths, cov0)
        (state, tokens, logps, finished, lengths, cov), ys = jax.lax.scan(
            body, carry, jnp.arange(max_len))
        seqs = _reconstruct_seqs(*ys)
    else:
        carry = (state, tokens, logps, finished, lengths, seqs, cov0)
        (state, tokens, logps, finished, lengths, seqs, cov), _ = (
            jax.lax.scan(body, carry, jnp.arange(max_len)))

    # rank by length-normalized score; prefer finished hypotheses
    lp = LENGTH_PENALTIES[length_penalty]
    norm = logps / lp(jnp.maximum(lengths, 1), alpha)
    if cov is not None:
        cp = COVERAGE_PENALTIES[coverage_penalty]
        mask = (jnp.ones(cov.shape[-1], bool)[None, None, :]
                if cov_mask is None else cov_mask[:, None, :])
        norm = norm + cp(cov, mask, coverage_beta)
    ranked = norm + finished.astype(norm.dtype) * 1e4
    if return_nbest:
        order = jnp.argsort(-ranked, axis=-1)                 # [B, K]
        nb_seqs = jnp.take_along_axis(seqs, order[..., None], axis=1)
        nb_scores = jnp.take_along_axis(norm, order, axis=1)
        return nb_seqs, nb_scores
    best = jnp.argmax(ranked, axis=-1)
    best_seq = jnp.take_along_axis(
        seqs, best[:, None, None], axis=1)[:, 0]              # [B, T]
    best_score = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
    return best_seq, best_score
