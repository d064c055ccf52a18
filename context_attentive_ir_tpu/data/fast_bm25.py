"""ctypes bindings for the native BM25 scorer (native/bm25.cpp).

Parity target: the reference's AOL slate construction -- BM25 top-50 over
the title corpus (SURVEY.md SS2.11, marker ``exp:``).  Python
(``data/bm25.py``) owns tokenization + index construction and is the
semantics reference; this wrapper ships the packed CSR postings to the
C++ scorer once and then runs per-query accumulation + top-k natively --
the hot loop of corpus preparation on this single-core host.

Loads ``build/libbm25.so`` if present, otherwise compiles it once with
g++ (same pattern as ``fast.py``).  Falls back is handled by the caller
(``BM25Index`` catches any failure here and stays pure-numpy).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "bm25.cpp"
_LIB = _REPO / "build" / "libbm25.so"

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        _LIB.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
             "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.info("bm25 native build unavailable: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _LIB.exists() and not (_SRC.exists() and _build()):
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError as e:
        logger.info("bm25 native load failed: %s", e)
        _load_failed = True
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.bm25_new.restype = ctypes.c_void_p
    lib.bm25_new.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p, i32p,
                             f32p, f32p, f32p, ctypes.c_float]
    lib.bm25_free.argtypes = [ctypes.c_void_p]
    lib.bm25_search.argtypes = [ctypes.c_void_p, i32p, i64p,
                                ctypes.c_int64, ctypes.c_int32, i32p, f32p]
    _lib = lib
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class NativeBM25:
    """Native scorer over a built ``BM25Index``'s packed postings."""

    def __init__(self, index):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native bm25 unavailable")
        self._lib = lib
        self.n_docs = index.n_docs
        # keep the arrays alive for the bm25_new call only (C++ copies)
        offsets = np.ascontiguousarray(index._offsets, np.int64)
        post_doc = np.ascontiguousarray(index._post_doc, np.int32)
        post_tf = np.ascontiguousarray(index._post_tf, np.float32)
        idf = np.ascontiguousarray(index._idf, np.float32)
        norm = np.ascontiguousarray(index._norm, np.float32)
        self._handle = lib.bm25_new(
            index.n_docs, len(index._idf), _ptr(offsets, ctypes.c_int64),
            _ptr(post_doc, ctypes.c_int32), _ptr(post_tf, ctypes.c_float),
            _ptr(idf, ctypes.c_float), _ptr(norm, ctypes.c_float),
            ctypes.c_float(index.k1))

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.bm25_free(self._handle)
            self._handle = None

    def search_batch(self, tid_lists: Sequence[Sequence[int]], k: int
                     ) -> list[tuple[np.ndarray, np.ndarray]]:
        k = min(k, self.n_docs)
        n = len(tid_lists)
        q_offsets = np.zeros(n + 1, np.int64)
        np.cumsum([len(t) for t in tid_lists], out=q_offsets[1:])
        q_tids = np.asarray([t for ts in tid_lists for t in ts]
                            or [0], np.int32)
        out_idx = np.empty((n, k), np.int32)
        out_score = np.empty((n, k), np.float32)
        self._lib.bm25_search(
            self._handle, _ptr(q_tids, ctypes.c_int32),
            _ptr(q_offsets, ctypes.c_int64), n, k,
            _ptr(out_idx, ctypes.c_int32), _ptr(out_score, ctypes.c_float))
        return [(out_idx[i], out_score[i]) for i in range(n)]

    def search(self, tids: Sequence[int], k: int
               ) -> tuple[np.ndarray, np.ndarray]:
        return self.search_batch([tids], k)[0]
