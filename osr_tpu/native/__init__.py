"""ctypes bindings to the native (C++) runtime components in native/.

Everything here degrades gracefully: importing a symbol raises ImportError
when the shared library isn't built, and every caller in the framework
falls back to its pure-Python path. Build with ``make -C native`` (the
loader also attempts a one-shot silent build on first import).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import List, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _REPO_ROOT / "native" / "libosrnative.so"


def _load() -> ctypes.CDLL:
    if not _LIB_PATH.exists():
        import os

        src = _LIB_PATH.parent / "osr_native.cc"
        if not src.exists():
            raise ImportError("native sources not present")
        # The auto-build is an import side effect; keep it short and
        # one-shot. OSR_TPU_BUILD_NATIVE=0 disables it entirely, and a
        # failure stamp stops every later import from re-running make on a
        # broken toolchain (delete the stamp to retry).
        if os.environ.get("OSR_TPU_BUILD_NATIVE", "1") == "0":
            raise ImportError("native auto-build disabled")
        stamp = _LIB_PATH.parent / ".build_failed"
        if stamp.exists():
            raise ImportError(f"native build previously failed (see {stamp})")
        try:
            subprocess.run(
                ["make", "-C", str(_LIB_PATH.parent)],
                capture_output=True,
                timeout=30,
                check=True,
            )
        except Exception as e:  # pragma: no cover - toolchain dependent
            try:
                stamp.write_text(str(e))
            except OSError:
                pass
            raise ImportError(f"native build failed: {e}")
    lib = ctypes.CDLL(str(_LIB_PATH))

    c_char_p = ctypes.c_char_p
    c_void_p = ctypes.c_void_p
    c_i64 = ctypes.c_int64
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_i32 = ctypes.POINTER(ctypes.c_int32)
    p_f32 = ctypes.POINTER(ctypes.c_float)

    lib.tf_build.restype = c_void_p
    lib.tf_build.argtypes = [c_char_p, c_i64, p_i64, c_i64]
    lib.tf_num_terms.restype = c_i64
    lib.tf_num_terms.argtypes = [c_void_p]
    lib.tf_nnz.restype = c_i64
    lib.tf_nnz.argtypes = [c_void_p]
    lib.tf_term_bytes.restype = c_i64
    lib.tf_term_bytes.argtypes = [c_void_p]
    lib.tf_copy.restype = None
    lib.tf_copy.argtypes = [
        c_void_p, p_i64, p_i32, p_f32, p_f32, p_i64, c_char_p, p_i64,
    ]
    lib.tf_free.restype = None
    lib.tf_free.argtypes = [c_void_p]

    lib.tokenize_ascii.restype = c_i64
    lib.tokenize_ascii.argtypes = [c_char_p, c_i64, c_char_p, p_i64, p_i64, c_i64]

    lib.zlib_decompress.restype = c_i64
    lib.zlib_decompress.argtypes = [c_char_p, c_i64, c_char_p, c_i64]
    lib.zlib_compress_bound.restype = c_i64
    lib.zlib_compress_bound.argtypes = [c_i64]
    lib.zlib_compress2.restype = c_i64
    lib.zlib_compress2.argtypes = [c_char_p, c_i64, c_char_p, c_i64, ctypes.c_int]
    return lib


_lib = _load()


def _as_i64_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def build_corpus_tf(
    texts_utf8: bytes, doc_offsets: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, List[str]]:
    """Tokenize + TF-count a concatenated ASCII corpus in C++.

    Args:
      texts_utf8: all document texts concatenated (ASCII bytes).
      doc_offsets: (ndocs+1,) int64 byte offsets into ``texts_utf8``.

    Returns: (indptr (ndocs+1,), term_ids_temp (nnz,), counts (nnz,),
    doc_lengths (ndocs,), df (nterms,), terms list) with term ids in
    first-seen order — callers re-number as they see fit.
    """
    ndocs = len(doc_offsets) - 1
    doc_offsets = np.ascontiguousarray(doc_offsets, dtype=np.int64)
    handle = _lib.tf_build(
        texts_utf8, len(texts_utf8), _as_i64_ptr(doc_offsets), ndocs
    )
    if not handle:
        raise RuntimeError("tf_build failed")
    try:
        nterms = _lib.tf_num_terms(handle)
        nnz = _lib.tf_nnz(handle)
        tbytes = _lib.tf_term_bytes(handle)
        indptr = np.empty(ndocs + 1, dtype=np.int64)
        term_ids = np.empty(nnz, dtype=np.int32)
        counts = np.empty(nnz, dtype=np.float32)
        doc_lengths = np.empty(ndocs, dtype=np.float32)
        df = np.empty(nterms, dtype=np.int64)
        term_buf = ctypes.create_string_buffer(max(tbytes, 1))
        term_offs = np.empty(nterms + 1, dtype=np.int64)
        _lib.tf_copy(
            handle,
            _as_i64_ptr(indptr),
            term_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            doc_lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            _as_i64_ptr(df),
            term_buf,
            _as_i64_ptr(term_offs),
        )
    finally:
        _lib.tf_free(handle)
    raw = term_buf.raw[:tbytes]
    terms = [
        raw[term_offs[i] : term_offs[i + 1]].decode("ascii")
        for i in range(nterms)
    ]
    return indptr, term_ids, counts, doc_lengths, df, terms


def ascii_tokenize(text: str) -> List[str]:
    """Tokenize an ASCII string exactly like ``re.findall(r'\\b\\w+\\b',
    text.lower())``."""
    data = text.encode("ascii")
    n = len(data)
    out = ctypes.create_string_buffer(max(n, 1))
    # Exact worst case: tokens alternate with separators -> ceil(n/2).
    max_tokens = n // 2 + 1
    starts = np.empty(max_tokens, dtype=np.int64)
    ends = np.empty(max_tokens, dtype=np.int64)
    count = _lib.tokenize_ascii(
        data, n, out, _as_i64_ptr(starts), _as_i64_ptr(ends), max_tokens
    )
    lowered = out.raw[:n]
    return [
        lowered[starts[i] : ends[i]].decode("ascii") for i in range(count)
    ]


def zlib_decompress(payload: bytes, raw_len: int) -> bytes:
    out = ctypes.create_string_buffer(max(raw_len, 1))
    got = _lib.zlib_decompress(payload, len(payload), out, raw_len)
    if got != raw_len:
        raise ValueError("native zlib_decompress failed")
    return out.raw[:raw_len]


def zlib_compress(raw: bytes, level: int = 6) -> bytes:
    cap = _lib.zlib_compress_bound(len(raw))
    out = ctypes.create_string_buffer(cap)
    got = _lib.zlib_compress2(raw, len(raw), out, cap, level)
    if got < 0:
        raise ValueError("native zlib_compress failed")
    return out.raw[:got]
