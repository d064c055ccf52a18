"""ctypes bindings for the native fast vectorizer (native/fastvec.cpp).

Parity target: the reference's vectorize/batchify hot loop
(SURVEY.md SS2.1 'Vectorizer'/'Batcher', marker ``exp:``) -- the rebuild's
native-component obligation (SURVEY.md SS2.12) covers the single-core
host input pipeline with C++ instead of Python.

Precondition: tokens are whitespace-free and non-empty (true for every
token ``load_data`` produces -- it whitespace-splits).  The native path
re-joins tokens with spaces and re-splits in C++, so tokens violating
this diverge from the Python fallback.

Loads ``build/libfastvec.so`` if present, otherwise compiles it once with
g++ (cached).  Every entry point has a pure-Python fallback in
``vectorize.py`` -- the native path is an accelerator, not a dependency
(equivalence tested in tests/test_fastvec.py).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ..constants import BOS, EOS
from .dictionary import Dictionary

logger = logging.getLogger(__name__)

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "fastvec.cpp"
_LIB = _REPO / "build" / "libfastvec.so"

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
    except Exception as e:  # g++ missing, compile error, ...
        logger.info("fastvec build unavailable: %s", e)
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
        logger.info("fastvec load failed: %s", e)
        _load_failed = True
        return None
    lib.fv_vocab_create.restype = ctypes.c_void_p
    lib.fv_vocab_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32]
    lib.fv_vocab_free.argtypes = [ctypes.c_void_p]
    lib.fv_vocab_size.restype = ctypes.c_int32
    lib.fv_vocab_size.argtypes = [ctypes.c_void_p]
    lib.fv_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8)]
    lib.fv_encode_target.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32]
    _lib = lib
    return _lib


class FastVocab:
    """Native vocabulary handle built from a Python Dictionary.

    The word list is passed in index order (specials included), so native
    ids match the Dictionary exactly.
    """

    def __init__(self, word_dict: Dictionary):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native fastvec unavailable")
        self._lib = lib
        words = [word_dict.ind2tok[i].encode("utf-8")
                 for i in range(len(word_dict))]
        arr = (ctypes.c_char_p * len(words))(*words)
        self._handle = lib.fv_vocab_create(arr, len(words),
                                           1 if word_dict.uncase else 0)
        self.size = lib.fv_vocab_size(self._handle)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.fv_vocab_free(self._handle)
            self._handle = None

    def encode_batch(self, texts: Sequence[str], max_len: int
                     ) -> tuple[np.ndarray, np.ndarray]:
        """texts -> (ids [n, max_len] int32, mask [n, max_len] bool)."""
        n = len(texts)
        out = np.empty((n, max_len), np.int32)
        mask = np.empty((n, max_len), np.uint8)
        arr = (ctypes.c_char_p * n)(*[t.encode("utf-8") for t in texts])
        self._lib.fv_encode_batch(
            self._handle, arr, n, max_len,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out, mask.astype(bool)

    def encode_targets(self, texts: Sequence[str], max_len: int):
        """texts -> (tin, tout [n, max_len] int32, tmask [n, max_len])."""
        n = len(texts)
        tin = np.empty((n, max_len), np.int32)
        tout = np.empty((n, max_len), np.int32)
        tmask = np.empty((n, max_len), np.uint8)
        for i, t in enumerate(texts):
            self._lib.fv_encode_target(
                self._handle, t.encode("utf-8"), BOS, EOS,
                tin[i].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                tout[i].ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                tmask[i].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                max_len)
        return tin, tout, tmask.astype(bool)


def available() -> bool:
    return get_lib() is not None
