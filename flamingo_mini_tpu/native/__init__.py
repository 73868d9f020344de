"""Native (C++) runtime tier: ctypes bindings + on-demand build.

The reference has zero native components (pure Python/PyTorch; SURVEY.md §2);
this tier exists for host-side hot paths of a production serving stack. The
first component is the BPE merge engine (bpe.cpp) used by tokenizer.py.

The shared library builds on first use with g++ (no pybind11/cmake needed)
and is cached next to the source. Set FLAMINGO_NO_NATIVE=1 to disable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libflamingo_native.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    src = os.path.join(_DIR, "bpe.cpp")
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src,
           "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib
    if os.environ.get("FLAMINGO_NO_NATIVE") == "1":
        return None
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.isfile(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH)
                    < os.path.getmtime(os.path.join(_DIR, "bpe.cpp"))):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
        except (OSError, subprocess.CalledProcessError):
            return None
        i64 = ctypes.c_int64
        p64 = ctypes.POINTER(ctypes.c_int64)
        lib.bpe_new.restype = ctypes.c_void_p
        lib.bpe_new.argtypes = [i64, p64, p64, p64]
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        lib.bpe_encode.restype = i64
        lib.bpe_encode.argtypes = [ctypes.c_void_p, p64, i64, p64, i64]
        lib.bpe_encode_batch.restype = i64
        lib.bpe_encode_batch.argtypes = [ctypes.c_void_p, p64, p64, i64,
                                         p64, p64, i64]
        _lib = lib
        return _lib


class NativeBPE:
    """Integer-domain BPE merger backed by bpe.cpp.

    Construction: ``merges`` as (rank-ordered) triples of vocab ids
    (left, right, merged). ``encode_word`` takes/returns vocab ids.
    """

    def __init__(self, triples: Sequence[Tuple[int, int, int]]):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        arr = np.asarray(triples, np.int64).reshape(-1, 3)
        lefts = np.ascontiguousarray(arr[:, 0])
        rights = np.ascontiguousarray(arr[:, 1])
        merged = np.ascontiguousarray(arr[:, 2])
        p64 = ctypes.POINTER(ctypes.c_int64)
        self._handle = lib.bpe_new(
            len(arr), lefts.ctypes.data_as(p64), rights.ctypes.data_as(p64),
            merged.ctypes.data_as(p64))

    def __del__(self):
        if getattr(self, "_handle", None) and getattr(self, "_lib", None):
            self._lib.bpe_free(self._handle)
            self._handle = None

    def encode_word(self, symbol_ids: Sequence[int]) -> List[int]:
        n = len(symbol_ids)
        if n <= 1:
            return list(symbol_ids)
        inp = np.asarray(symbol_ids, np.int64)
        out = np.empty(n, np.int64)
        p64 = ctypes.POINTER(ctypes.c_int64)
        m = self._lib.bpe_encode(self._handle, inp.ctypes.data_as(p64), n,
                                 out.ctypes.data_as(p64), n)
        assert m >= 0
        return out[:m].tolist()

    def encode_words(self, words: Sequence[Sequence[int]]) -> List[List[int]]:
        """Batch encode (one ctypes call for many words)."""
        if not words:
            return []
        lens = np.asarray([len(w) for w in words], np.int64)
        flat = np.concatenate([np.asarray(w, np.int64) for w in words]) \
            if len(words) else np.zeros(0, np.int64)
        total = int(lens.sum())
        out = np.empty(max(total, 1), np.int64)
        out_lens = np.empty(len(words), np.int64)
        p64 = ctypes.POINTER(ctypes.c_int64)
        m = self._lib.bpe_encode_batch(
            self._handle, flat.ctypes.data_as(p64), lens.ctypes.data_as(p64),
            len(words), out.ctypes.data_as(p64), out_lens.ctypes.data_as(p64),
            len(out))
        assert m >= 0
        res, off = [], 0
        for ln in out_lens.tolist():
            res.append(out[off:off + ln].tolist())
            off += ln
        return res
