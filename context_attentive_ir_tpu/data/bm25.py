"""BM25 candidate-slate retrieval over a document-title corpus.

Parity target: the reference's data-prep layer (SURVEY.md SS2.11, marker
``exp:``): the preprocessed AOL sessions it trains on carry **BM25 top-50
candidate slates retrieved over the title corpus** (Sordoni et al. 2015
splits).  The reference repo ships the *result* of that retrieval; this
module makes the step runnable here, so a raw click log can be turned
into framework-format sessions offline (``cli/prepare_data.py bm25``).

Scoring is Okapi BM25 with the Lucene non-negative idf variant:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(q, d) = sum_t  idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

summed over query-token *occurrences* (a repeated query term counts
twice), k1 = 1.2, b = 0.75 -- the standard parameterization.

Host-side only (strings never reach the device).  Tokenization matches
``load_data``: whitespace split + ``dictionary.normalize`` (NFD +
casefold).  The per-term accumulation runs as vectorized numpy over CSR
postings; an optional native C++ scorer (``native/bm25.cpp``, loaded via
ctypes like fastvec) accelerates the single-core host and is
equivalence-tested against this implementation.
"""

from __future__ import annotations

import math
from typing import Iterable, Optional, Sequence

import numpy as np

from .dictionary import normalize

__all__ = ["BM25Index"]


def _tokenize(text_or_tokens, uncase: bool) -> list[str]:
    if isinstance(text_or_tokens, str):
        toks = text_or_tokens.split()
    else:
        toks = list(text_or_tokens)
    return [normalize(t, uncase) for t in toks]


class BM25Index:
    """Inverted-index BM25 retriever over a fixed title corpus.

    ``docs``: iterable of titles (strings or pre-split token lists).
    ``search(query, k)`` returns the top-k ``(indices, scores)`` by BM25,
    ties broken by lower doc index (deterministic).
    """

    def __init__(self, docs: Iterable, k1: float = 1.2, b: float = 0.75,
                 uncase: bool = True, use_native: bool = True):
        self.k1, self.b, self.uncase = float(k1), float(b), uncase
        term_ids: dict[str, int] = {}
        # per-term postings accumulated as python lists, packed to CSR
        post_docs: list[list[int]] = []
        post_tfs: list[list[int]] = []
        doc_lens: list[int] = []
        for di, doc in enumerate(docs):
            counts: dict[int, int] = {}
            toks = _tokenize(doc, uncase)
            for tok in toks:
                tid = term_ids.setdefault(tok, len(term_ids))
                if tid == len(post_docs):
                    post_docs.append([])
                    post_tfs.append([])
                counts[tid] = counts.get(tid, 0) + 1
            doc_lens.append(len(toks))
            for tid, tf in counts.items():
                post_docs[tid].append(di)
                post_tfs[tid].append(tf)
        self.n_docs = len(doc_lens)
        if self.n_docs == 0:
            raise ValueError("BM25Index needs a non-empty corpus")
        self.term_ids = term_ids
        self._doc_len = np.asarray(doc_lens, np.float32)
        avgdl = max(float(self._doc_len.mean()), 1e-9)
        # k1 * (1 - b + b * dl / avgdl), precomputed per doc
        self._norm = (self.k1 * (1.0 - self.b + self.b * self._doc_len
                                 / avgdl)).astype(np.float32)
        # CSR postings
        sizes = np.asarray([len(p) for p in post_docs], np.int64)
        self._offsets = np.zeros(len(post_docs) + 1, np.int64)
        np.cumsum(sizes, out=self._offsets[1:])
        self._post_doc = np.asarray(
            [d for p in post_docs for d in p], np.int32)
        self._post_tf = np.asarray(
            [t for p in post_tfs for t in p], np.float32)
        df = sizes.astype(np.float64)
        self._idf = np.log1p((self.n_docs - df + 0.5) / (df + 0.5)).astype(
            np.float32)
        self._native = _native_handle(self) if use_native else None

    # -- retrieval ---------------------------------------------------

    def _query_tids(self, query) -> list[int]:
        tids = []
        for tok in _tokenize(query, self.uncase):
            tid = self.term_ids.get(tok)
            if tid is not None:
                tids.append(tid)
        return tids

    def scores(self, query) -> np.ndarray:
        """Dense BM25 scores over the whole corpus (testing / small N)."""
        out = np.zeros(self.n_docs, np.float32)
        for tid in self._query_tids(query):
            lo, hi = self._offsets[tid], self._offsets[tid + 1]
            d = self._post_doc[lo:hi]
            tf = self._post_tf[lo:hi]
            out[d] += (self._idf[tid] * tf * (self.k1 + 1.0)
                       / (tf + self._norm[d]))
        return out

    def search(self, query, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Top-k ``(doc indices, scores)``, score-descending, index-tied."""
        tids = self._query_tids(query)
        if self._native is not None:
            return self._native.search(tids, k)
        return self._topk(self.scores(query), k)

    def search_batch(self, queries: Sequence, k: int
                     ) -> list[tuple[np.ndarray, np.ndarray]]:
        if self._native is not None:
            return self._native.search_batch(
                [self._query_tids(q) for q in queries], k)
        return [self.search(q, k) for q in queries]

    def _topk(self, scores: np.ndarray, k: int
              ) -> tuple[np.ndarray, np.ndarray]:
        k = min(k, self.n_docs)
        # full lexsort (not argpartition): boundary ties must break on doc
        # index deterministically so the native scorer can match exactly.
        # The Python path is the semantics reference; the C++ path is the
        # fast one on real corpora.
        idx = np.lexsort((np.arange(self.n_docs), -scores))[:k]
        return idx.astype(np.int32), scores[idx]


def _native_handle(index: BM25Index):
    """Build the optional C++ scorer handle; None if unavailable."""
    try:
        from .fast_bm25 import NativeBM25
        return NativeBM25(index)
    except Exception:
        return None
