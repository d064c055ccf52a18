"""Vectorization: object graph -> static-shape numpy batches.

Parity target: ``vectorize`` / ``batchify`` in ``neuroir/inputters/vector.py``
(SURVEY.md SS2.1, marker ``exp:``), which pad-and-stack per-example tensors to
``[batch, session, q_len]`` / ``[batch, session, n_cand, d_len]`` with masks.

TPU-first redesign (NOT a port): the reference vectorizes one example at a
time inside DataLoader workers and pads per-batch to the *longest* element,
giving dynamic shapes.  Here every batch is padded to a fixed
``ShapeConfig`` so each model compiles exactly once under ``jax.jit``; masks
(bool) carry the true lengths.  Three batch families mirror the reference's
three Dataset families:

- ``RankBatch``     -- one (query, slate) per row          (rankers)
- ``SuggestBatch``  -- one (session prefix, next query) per row (recommenders)
- ``SessionBatch``  -- one whole session per row           (multitask)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from flax import struct

from ..constants import (
    BOS,
    EOS,
    MAX_DOC_LEN,
    MAX_QUERY_LEN,
    MAX_SESSION_LEN,
    NUM_CANDIDATES,
    PAD,
)
from .dictionary import CharDictionary, Dictionary
from .objects import Document, Query, Session

_CHAR_DICT = CharDictionary()


@dataclass(frozen=True)
class ShapeConfig:
    """Static padding targets for every tensor in a batch."""

    max_query_len: int = MAX_QUERY_LEN
    max_doc_len: int = MAX_DOC_LEN
    max_session_len: int = MAX_SESSION_LEN
    num_candidates: int = NUM_CANDIDATES
    # > 0 enables char-level features (byte ids per word) for the word
    # hashing / char-CNN paths (SURVEY.md SS2.1/SS2.3, --use_charngram)
    max_word_len: int = 0
    # target length = query length + 1 (room for BOS/EOS shift)
    @property
    def max_target_len(self) -> int:
        return self.max_query_len + 1
    # source length for flat-context recommenders (concat of session queries)
    @property
    def max_source_len(self) -> int:
        return self.max_session_len * self.max_query_len


# ---------------------------------------------------------------------------
# Batch containers (pytrees -- device-ready)
# ---------------------------------------------------------------------------


@struct.dataclass
class RankBatch:
    """One (query, candidate slate) per row."""

    query: np.ndarray        # int32 [B, Lq]
    query_mask: np.ndarray   # bool  [B, Lq]
    docs: np.ndarray         # int32 [B, N, Ld]
    doc_mask: np.ndarray     # bool  [B, N, Ld]
    labels: np.ndarray       # f32   [B, N]   (binary clicks)
    cand_mask: np.ndarray    # bool  [B, N]   (valid candidates)
    row_mask: np.ndarray     # bool  [B]      (valid rows, for padding batches)
    query_chars: np.ndarray | None = None  # int32 [B, Lq, Lw]
    doc_chars: np.ndarray | None = None    # int32 [B, N, Ld, Lw]

    @property
    def batch_size(self) -> int:
        return self.query.shape[0]


@struct.dataclass
class SuggestBatch:
    """One (session context, next query) per row.

    ``source`` is the flat concatenation of the context queries (for seq2seq /
    ACG-style models); ``context`` keeps them separated per turn (for
    hierarchical models like HRED-QS).
    """

    source: np.ndarray        # int32 [B, Lsrc]
    source_mask: np.ndarray   # bool  [B, Lsrc]
    context: np.ndarray       # int32 [B, S, Lq]
    context_mask: np.ndarray  # bool  [B, S, Lq]
    turn_mask: np.ndarray     # bool  [B, S]
    target_in: np.ndarray     # int32 [B, Lt]  (BOS + tokens)
    target_out: np.ndarray    # int32 [B, Lt]  (tokens + EOS)
    target_mask: np.ndarray   # bool  [B, Lt]
    row_mask: np.ndarray      # bool  [B]

    @property
    def batch_size(self) -> int:
        return self.source.shape[0]


@struct.dataclass
class SessionBatch:
    """One whole session per row (multitask models).

    Positions t = 0..S-1; the suggestion target at position t is query t+1
    (the last valid turn has no target -- ``target_mask`` is all-False there).
    """

    query: np.ndarray        # int32 [B, S, Lq]
    query_mask: np.ndarray   # bool  [B, S, Lq]
    docs: np.ndarray         # int32 [B, S, N, Ld]
    doc_mask: np.ndarray     # bool  [B, S, N, Ld]
    clicks: np.ndarray       # f32   [B, S, N]
    cand_mask: np.ndarray    # bool  [B, S, N]
    turn_mask: np.ndarray    # bool  [B, S]
    target_in: np.ndarray    # int32 [B, S, Lt]
    target_out: np.ndarray   # int32 [B, S, Lt]
    target_mask: np.ndarray  # bool  [B, S, Lt]
    row_mask: np.ndarray     # bool  [B]

    @property
    def batch_size(self) -> int:
        return self.query.shape[0]


# ---------------------------------------------------------------------------
# Vectorizers
# ---------------------------------------------------------------------------


def _pad_ids(ids: list[int], length: int) -> tuple[np.ndarray, np.ndarray]:
    arr = np.full((length,), PAD, dtype=np.int32)
    n = min(len(ids), length)
    arr[:n] = ids[:n]
    mask = np.zeros((length,), dtype=bool)
    mask[:n] = True
    return arr, mask


def _encode_query(q: Query, word_dict: Dictionary, length: int):
    return _pad_ids(word_dict.encode(q.tokens), length)


def _encode_doc(d: Document, word_dict: Dictionary, length: int):
    return _pad_ids(word_dict.encode(d.tokens), length)


def _encode_chars(tokens: list[str], length: int,
                  word_len: int) -> np.ndarray:
    out = np.zeros((length, word_len), np.int32)
    for i, tok in enumerate(tokens[:length]):
        out[i] = _CHAR_DICT.encode_word(tok, word_len)
    return out


def _encode_target(q: Query, word_dict: Dictionary, length: int):
    """Teacher-forcing pair: (BOS + toks)[:L], (toks + EOS)[:L]."""
    ids = word_dict.encode(q.tokens)[: length - 1]
    tin, _ = _pad_ids([BOS] + ids, length)
    tout, tmask = _pad_ids(ids + [EOS], length)
    return tin, tout, tmask


def rank_examples(sessions: list[Session]) -> list[Query]:
    """Flatten sessions into (query, slate) examples with >=1 candidate."""
    return [q for s in sessions for q in s.queries if q.documents]


def suggest_examples(sessions: list[Session]) -> list[tuple[list[Query], Query, Query]]:
    """(context queries incl. current, current query, next query) triples."""
    out = []
    for s in sessions:
        for t in range(len(s.queries) - 1):
            out.append((s.queries[: t + 1], s.queries[t], s.queries[t + 1]))
    return out


def build_rank_batch(
    examples: list[Query], word_dict: Dictionary, shapes: ShapeConfig,
    batch_size: int | None = None, fast=None,
) -> RankBatch:
    B = batch_size or len(examples)
    Lq, N, Ld = shapes.max_query_len, shapes.num_candidates, shapes.max_doc_len
    if fast is not None and shapes.max_word_len == 0:
        return _build_rank_batch_fast(examples, shapes, B, fast)
    query = np.full((B, Lq), PAD, np.int32)
    query_mask = np.zeros((B, Lq), bool)
    docs = np.full((B, N, Ld), PAD, np.int32)
    doc_mask = np.zeros((B, N, Ld), bool)
    labels = np.zeros((B, N), np.float32)
    cand_mask = np.zeros((B, N), bool)
    row_mask = np.zeros((B,), bool)
    Lw = shapes.max_word_len
    q_chars = np.zeros((B, Lq, Lw), np.int32) if Lw else None
    d_chars = np.zeros((B, N, Ld, Lw), np.int32) if Lw else None
    for i, q in enumerate(examples[:B]):
        query[i], query_mask[i] = _encode_query(q, word_dict, Lq)
        if Lw:
            q_chars[i] = _encode_chars(q.tokens, Lq, Lw)
        for j, d in enumerate(q.documents[:N]):
            docs[i, j], doc_mask[i, j] = _encode_doc(d, word_dict, Ld)
            labels[i, j] = float(d.label)
            cand_mask[i, j] = True
            if Lw:
                d_chars[i, j] = _encode_chars(d.tokens, Ld, Lw)
        row_mask[i] = True
    return RankBatch(query, query_mask, docs, doc_mask, labels, cand_mask,
                     row_mask, q_chars, d_chars)


def _build_rank_batch_fast(examples, shapes: ShapeConfig, B: int,
                           fast) -> RankBatch:
    """Native-vectorized rank batch (data/fast.py); same semantics as the
    Python path -- equivalence tested in tests/test_fastvec.py."""
    Lq, N, Ld = (shapes.max_query_len, shapes.num_candidates,
                 shapes.max_doc_len)
    n = min(len(examples), B)
    q_texts = [" ".join(q.tokens) for q in examples[:n]]
    d_texts, labels_l, cand_l = [], [], []
    for q in examples[:n]:
        docs = q.documents[:N]
        d_texts.extend(" ".join(d.tokens) for d in docs)
        d_texts.extend([""] * (N - len(docs)))
        labels_l.append([float(d.label) for d in docs]
                        + [0.0] * (N - len(docs)))
        cand_l.append([True] * len(docs) + [False] * (N - len(docs)))
    q_ids, q_mask = fast.encode_batch(q_texts, Lq)
    d_ids, d_mask = fast.encode_batch(d_texts, Ld)

    query = np.full((B, Lq), PAD, np.int32)
    query_mask = np.zeros((B, Lq), bool)
    docs = np.full((B, N, Ld), PAD, np.int32)
    doc_mask = np.zeros((B, N, Ld), bool)
    labels = np.zeros((B, N), np.float32)
    cand_mask = np.zeros((B, N), bool)
    row_mask = np.zeros((B,), bool)
    query[:n], query_mask[:n] = q_ids, q_mask
    docs[:n] = d_ids.reshape(n, N, Ld)
    doc_mask[:n] = d_mask.reshape(n, N, Ld)
    labels[:n] = np.asarray(labels_l, np.float32)
    cand_mask[:n] = np.asarray(cand_l, bool)
    row_mask[:n] = True
    return RankBatch(query, query_mask, docs, doc_mask, labels, cand_mask,
                     row_mask)


def build_suggest_batch(
    examples: list[tuple[list[Query], Query, Query]],
    word_dict: Dictionary, shapes: ShapeConfig,
    batch_size: int | None = None, fast=None,
) -> SuggestBatch:
    B = batch_size or len(examples)
    S, Lq, Lt = shapes.max_session_len, shapes.max_query_len, shapes.max_target_len
    Lsrc = shapes.max_source_len
    source = np.full((B, Lsrc), PAD, np.int32)
    source_mask = np.zeros((B, Lsrc), bool)
    context = np.full((B, S, Lq), PAD, np.int32)
    context_mask = np.zeros((B, S, Lq), bool)
    turn_mask = np.zeros((B, S), bool)
    target_in = np.full((B, Lt), PAD, np.int32)
    target_out = np.full((B, Lt), PAD, np.int32)
    target_mask = np.zeros((B, Lt), bool)
    row_mask = np.zeros((B,), bool)
    for i, (ctx, _cur, nxt) in enumerate(examples[:B]):
        flat: list[int] = []
        for t, q in enumerate(ctx[-S:]):
            context[i, t], context_mask[i, t] = _encode_query(q, word_dict, Lq)
            turn_mask[i, t] = True
            # truncate per turn like `context` does: keeps source/context
            # in agreement AND bounds flat at S*Lq = Lsrc, so the newest
            # turns (the strongest signal) can never be cut by _pad_ids
            flat.extend(word_dict.encode(q.tokens[:Lq]))
        source[i], source_mask[i] = _pad_ids(flat, Lsrc)
        target_in[i], target_out[i], target_mask[i] = _encode_target(
            nxt, word_dict, Lt)
        row_mask[i] = True
    return SuggestBatch(source, source_mask, context, context_mask, turn_mask,
                        target_in, target_out, target_mask, row_mask)


def build_session_batch(
    sessions: list[Session], word_dict: Dictionary, shapes: ShapeConfig,
    batch_size: int | None = None, fast=None,
) -> SessionBatch:
    B = batch_size or len(sessions)
    S, Lq = shapes.max_session_len, shapes.max_query_len
    N, Ld, Lt = shapes.num_candidates, shapes.max_doc_len, shapes.max_target_len
    if fast is not None:
        return _build_session_batch_fast(sessions, shapes, B, fast)
    query = np.full((B, S, Lq), PAD, np.int32)
    query_mask = np.zeros((B, S, Lq), bool)
    docs = np.full((B, S, N, Ld), PAD, np.int32)
    doc_mask = np.zeros((B, S, N, Ld), bool)
    clicks = np.zeros((B, S, N), np.float32)
    cand_mask = np.zeros((B, S, N), bool)
    turn_mask = np.zeros((B, S), bool)
    target_in = np.full((B, S, Lt), PAD, np.int32)
    target_out = np.full((B, S, Lt), PAD, np.int32)
    target_mask = np.zeros((B, S, Lt), bool)
    row_mask = np.zeros((B,), bool)
    for i, sess in enumerate(sessions[:B]):
        qs = sess.queries[:S]
        for t, q in enumerate(qs):
            query[i, t], query_mask[i, t] = _encode_query(q, word_dict, Lq)
            turn_mask[i, t] = True
            for j, d in enumerate(q.documents[:N]):
                docs[i, t, j], doc_mask[i, t, j] = _encode_doc(d, word_dict, Ld)
                clicks[i, t, j] = float(d.label)
                cand_mask[i, t, j] = True
            if t + 1 < len(qs):
                (target_in[i, t], target_out[i, t],
                 target_mask[i, t]) = _encode_target(qs[t + 1], word_dict, Lt)
        row_mask[i] = True
    return SessionBatch(query, query_mask, docs, doc_mask, clicks, cand_mask,
                        turn_mask, target_in, target_out, target_mask, row_mask)


def _build_session_batch_fast(sessions, shapes: ShapeConfig, B: int,
                              fast) -> SessionBatch:
    """Native-vectorized session batch (data/fast.py)."""
    S, Lq = shapes.max_session_len, shapes.max_query_len
    N, Ld, Lt = (shapes.num_candidates, shapes.max_doc_len,
                 shapes.max_target_len)
    n = min(len(sessions), B)
    q_texts, d_texts, t_texts = [], [], []
    clicks = np.zeros((B, S, N), np.float32)
    cand_mask = np.zeros((B, S, N), bool)
    turn_mask = np.zeros((B, S), bool)
    has_target = np.zeros((B, S), bool)
    row_mask = np.zeros((B,), bool)
    for i, sess in enumerate(sessions[:n]):
        qs = sess.queries[:S]
        for t in range(S):
            if t < len(qs):
                q = qs[t]
                q_texts.append(" ".join(q.tokens))
                turn_mask[i, t] = True
                docs_t = q.documents[:N]
                d_texts.extend(" ".join(d.tokens) for d in docs_t)
                d_texts.extend([""] * (N - len(docs_t)))
                for j, d in enumerate(docs_t):
                    clicks[i, t, j] = float(d.label)
                    cand_mask[i, t, j] = True
                if t + 1 < len(qs):
                    t_texts.append(" ".join(qs[t + 1].tokens))
                    has_target[i, t] = True
                else:
                    t_texts.append("")
            else:
                q_texts.append("")
                t_texts.append("")
                d_texts.extend([""] * N)
        row_mask[i] = True

    q_ids, q_mask = fast.encode_batch(q_texts, Lq)
    d_ids, d_mask = fast.encode_batch(d_texts, Ld)
    tin, tout, tmask = fast.encode_targets(t_texts, Lt)

    query = np.full((B, S, Lq), PAD, np.int32)
    query_mask = np.zeros((B, S, Lq), bool)
    docs = np.full((B, S, N, Ld), PAD, np.int32)
    doc_mask = np.zeros((B, S, N, Ld), bool)
    target_in = np.full((B, S, Lt), PAD, np.int32)
    target_out = np.full((B, S, Lt), PAD, np.int32)
    target_mask = np.zeros((B, S, Lt), bool)
    query[:n] = q_ids.reshape(n, S, Lq)
    query_mask[:n] = q_mask.reshape(n, S, Lq)
    docs[:n] = d_ids.reshape(n, S, N, Ld)
    doc_mask[:n] = d_mask.reshape(n, S, N, Ld)
    ht = has_target[:n].reshape(-1)
    target_in[:n] = np.where(ht[:, None], tin, PAD).reshape(n, S, Lt)
    target_out[:n] = np.where(ht[:, None], tout, PAD).reshape(n, S, Lt)
    target_mask[:n] = (tmask & ht[:, None]).reshape(n, S, Lt)
    # padded turns: wipe masks derived from empty strings
    query_mask[:n] &= turn_mask[:n, :, None]
    doc_mask[:n] &= cand_mask[:n, :, :, None]
    return SessionBatch(query, query_mask, docs, doc_mask, clicks, cand_mask,
                        turn_mask, target_in, target_out, target_mask,
                        row_mask)
