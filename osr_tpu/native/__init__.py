"""ctypes bindings to the native (C++) runtime components in native/.

Everything here degrades gracefully: importing a symbol raises ImportError
when the shared library isn't built, and every caller in the framework
falls back to its pure-Python path. Build with ``make -C native`` (the
loader also attempts a one-shot silent build on first import).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import List, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_REPO_ROOT = Path(__file__).resolve().parents[2]
# OSR_TPU_NATIVE_LIB points an installed (site-packages) copy of the
# package — which has no ../native source tree — at a prebuilt .so;
# the default is the repo checkout's auto-built artifact.
_LIB_PATH = Path(
    os.environ.get(
        "OSR_TPU_NATIVE_LIB", _REPO_ROOT / "native" / "libosrnative.so"
    )
)


def _load() -> ctypes.CDLL:
    src = _LIB_PATH.parent / "osr_native.cc"
    makefile = _LIB_PATH.parent / "Makefile"
    # A Makefile flag change (e.g. -ffp-contract, which the bit-identical
    # parity contract depends on) must also invalidate the .so, so the
    # newest of ALL build inputs is compared, not just the source.
    src_mtime = max(
        (p.stat().st_mtime for p in (src, makefile) if p.exists()),
        default=0.0,
    )
    stale = (
        _LIB_PATH.exists()
        and src.exists()
        and _LIB_PATH.stat().st_mtime < src_mtime
    )
    if not _LIB_PATH.exists() or stale:
        import os

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
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        # A truncated/corrupt .so (e.g. a build killed mid-link) must
        # degrade like a missing one: every consumer catches ImportError
        # and falls back to its NumPy path. Drop the bad artifact so the
        # next import can rebuild.
        try:
            _LIB_PATH.unlink()
        except OSError:
            pass
        raise ImportError(f"native library failed to load: {e}")
    try:
        return _bind(lib)
    except AttributeError as e:
        # A stale .so from an older source revision lacks newly added
        # symbols; degrade to the NumPy paths rather than crash. (The
        # mtime check above rebuilds automatically in a git checkout;
        # this covers a stale artifact with a fresher mtime.)
        raise ImportError(f"native library is stale: {e}")


_ABI_VERSION = 2  # must match osr_abi_version() in native/osr_native.cc


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:

    lib.osr_abi_version.restype = ctypes.c_int64
    lib.osr_abi_version.argtypes = []
    got = int(lib.osr_abi_version())
    if got != _ABI_VERSION:
        # A stale artifact whose mtime beats the source (copied .so,
        # touched file) may still EXPORT every symbol while an existing
        # signature changed — calling through the old layout would
        # corrupt memory. Mismatch degrades to the NumPy paths.
        raise AttributeError(
            f"ABI version {got}, binding expects {_ABI_VERSION}"
        )

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

    lib.vocab_build.restype = c_void_p
    lib.vocab_build.argtypes = [c_char_p, p_i64, c_i64]
    lib.vocab_free.restype = None
    lib.vocab_free.argtypes = [c_void_p]
    lib.encode_queries.restype = c_i64
    lib.encode_queries.argtypes = [
        c_void_p, c_char_p, p_i64, c_i64, p_i32, p_f32, p_i64, c_i64,
    ]
    lib.tail_candidates.restype = c_i64
    lib.tail_candidates.argtypes = [
        p_i64, p_i32, p_f32, p_i32, p_f32, p_i64, c_i64,
        p_i32, p_i32, p_f32, p_i64, c_i64,
    ]
    lib.cand_head_dot.restype = None
    lib.cand_head_dot.argtypes = [
        c_void_p, c_i64, p_f32, c_i64, p_i32, p_i32, c_i64,
        p_i32, p_f32, p_i64, p_f32,
    ]
    lib.merge_topk.restype = None
    lib.merge_topk.argtypes = [
        p_f32, p_i32, c_i64, c_i64, p_i32, p_f32, p_i64, c_i64, p_f32,
        p_f32, p_i32,
    ]

    p_i8 = ctypes.POINTER(ctypes.c_int8)
    lib.transpose_i8.restype = None
    lib.transpose_i8.argtypes = [p_i8, c_i64, c_i64, p_i8]
    lib.cand_head_dot_t.restype = None
    lib.cand_head_dot_t.argtypes = [
        p_i8, c_i64, p_i32, p_i64, c_i64, p_i32, p_f32, p_i64, p_f32,
    ]
    lib.pack_hybrid_int8.restype = c_i64
    lib.pack_hybrid_int8.argtypes = [
        p_i64, c_i64, c_i64, p_i32, p_f32, p_f32, p_f32, c_i64, c_i64,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        p_i8, p_f32, p_i64, p_i32, p_f32, c_i64,
    ]
    p_u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.pack_hybrid_int4.restype = c_i64
    lib.pack_hybrid_int4.argtypes = [
        p_i64, c_i64, c_i64, p_i32, p_f32, p_f32, p_f32, c_i64, c_i64,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        p_u8, p_f32, p_i64, p_i32, p_f32, c_i64,
    ]

    pp_char = ctypes.POINTER(c_char_p)
    lib.henc_create.restype = c_void_p
    lib.henc_create.argtypes = [c_i64, c_i64, ctypes.c_int]
    lib.henc_free.restype = None
    lib.henc_free.argtypes = [c_void_p]
    lib.henc_hash.restype = ctypes.c_uint64
    lib.henc_hash.argtypes = [c_char_p, c_i64]
    lib.henc_n_docs.restype = c_i64
    lib.henc_n_docs.argtypes = [c_void_p]
    lib.henc_df_size.restype = c_i64
    lib.henc_df_size.argtypes = [c_void_p]
    lib.henc_idf.restype = ctypes.c_double
    lib.henc_idf.argtypes = [c_void_p, ctypes.c_uint64]
    lib.henc_fit.restype = None
    lib.henc_fit.argtypes = [c_void_p, pp_char, p_i64, c_i64]
    p_u64 = ctypes.POINTER(ctypes.c_uint64)
    lib.henc_export_df.restype = None
    lib.henc_export_df.argtypes = [c_void_p, p_u64, p_i32]
    lib.henc_import_df.restype = None
    lib.henc_import_df.argtypes = [c_void_p, p_u64, p_i32, c_i64, c_i64]
    lib.henc_encode.restype = None
    lib.henc_encode.argtypes = [c_void_p, pp_char, p_i64, c_i64, p_f32]

    lib.zlib_decompress.restype = c_i64
    lib.zlib_decompress.argtypes = [c_char_p, c_i64, c_char_p, c_i64]
    lib.zlib_compress_bound.restype = c_i64
    lib.zlib_compress_bound.argtypes = [c_i64]
    lib.zlib_compress2.restype = c_i64
    lib.zlib_compress2.argtypes = [c_char_p, c_i64, c_char_p, c_i64, ctypes.c_int]

    lib.set_num_threads.restype = None
    lib.set_num_threads.argtypes = [ctypes.c_int]
    lib.get_num_threads.restype = ctypes.c_int
    lib.get_num_threads.argtypes = []
    return lib


_lib = _load()


def set_num_threads(n: int) -> None:
    """Force the host runtime's thread count (0/None restores auto).

    Every parallel section partitions work deterministically and each
    thread owns a disjoint output range, so results are bit-identical
    across thread counts (tests/test_native.py::test_multithreaded_*)."""
    _lib.set_num_threads(int(n or 0))


def get_num_threads() -> int:
    """The thread count a large parallel section would use right now."""
    return int(_lib.get_num_threads())


def _init_threads_from_env() -> None:
    import os

    val = os.environ.get("OSR_TPU_THREADS", "").strip()
    if val:
        try:
            set_num_threads(int(val))
        except ValueError:
            logger.warning("Ignoring non-integer OSR_TPU_THREADS=%r", val)


_init_threads_from_env()


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


def _as_i32_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _as_f32_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeVocab:
    """C++ vocabulary handle for batch query encoding.

    Terms must be passed in term-id order (id = position); queries encode to
    sorted unique (term id, count) pairs, OOV dropped — byte-identical to the
    Python Tokenizer.encode_counts path on ASCII input.
    """

    def __init__(self, terms_in_id_order):
        buf = "".join(terms_in_id_order).encode("ascii")
        offs = np.zeros(len(terms_in_id_order) + 1, dtype=np.int64)
        np.cumsum(
            [len(t.encode("ascii")) for t in terms_in_id_order],
            out=offs[1:],
        )
        self._handle = _lib.vocab_build(buf, _as_i64_ptr(offs), len(offs) - 1)
        if not self._handle:
            raise RuntimeError("vocab_build failed")

    def __del__(self):
        h = getattr(self, "_handle", None)
        # _lib can already be None'd during interpreter shutdown; the
        # process is exiting, so leaking the handle is fine.
        if h and _lib is not None:
            _lib.vocab_free(h)
            self._handle = None

    def encode_queries(self, texts):
        """Encode a batch of ASCII queries -> (tids, counts, ptr) flat."""
        encoded = [t.encode("ascii") for t in texts]
        buf = b"".join(encoded)
        offs = np.zeros(len(encoded) + 1, dtype=np.int64)
        np.cumsum([len(e) for e in encoded], out=offs[1:])
        # Upper bound on pairs: total word characters / 1 is loose; use
        # token-count bound ceil(len/2)+1 per query.
        cap = sum(len(e) // 2 + 1 for e in encoded)
        tids = np.empty(max(cap, 1), dtype=np.int32)
        counts = np.empty(max(cap, 1), dtype=np.float32)
        ptr = np.zeros(len(encoded) + 1, dtype=np.int64)
        total = _lib.encode_queries(
            self._handle, buf, _as_i64_ptr(offs), len(encoded),
            _as_i32_ptr(tids), _as_f32_ptr(counts), _as_i64_ptr(ptr), cap,
        )
        if total < 0:
            raise RuntimeError("encode_queries capacity exceeded")
        return tids[:total].copy(), counts[:total].copy(), ptr


def tail_candidates_native(
    post_ptr, post_rows, post_weights, q_tids, q_counts, q_ptr
):
    """Flat tail-candidate scoring (see osr_tpu/index/postings.py)."""
    nq = len(q_ptr) - 1
    post_ptr = np.ascontiguousarray(post_ptr, dtype=np.int64)
    post_rows = np.ascontiguousarray(post_rows, dtype=np.int32)
    post_weights = np.ascontiguousarray(post_weights, dtype=np.float32)
    q_tids = np.ascontiguousarray(q_tids, dtype=np.int32)
    q_counts = np.ascontiguousarray(q_counts, dtype=np.float32)
    q_ptr = np.ascontiguousarray(q_ptr, dtype=np.int64)
    # Exact upper bound: sum of the query terms' posting-list lengths.
    cap = int((post_ptr[q_tids + 1] - post_ptr[q_tids]).sum()) if len(q_tids) else 0
    cap = max(cap, 1)
    rows = np.empty(cap, dtype=np.int32)
    cols = np.empty(cap, dtype=np.int32)
    tail = np.empty(cap, dtype=np.float32)
    qptr = np.zeros(nq + 1, dtype=np.int64)
    total = _lib.tail_candidates(
        _as_i64_ptr(post_ptr), _as_i32_ptr(post_rows),
        _as_f32_ptr(post_weights), _as_i32_ptr(q_tids),
        _as_f32_ptr(q_counts), _as_i64_ptr(q_ptr), nq,
        _as_i32_ptr(rows), _as_i32_ptr(cols), _as_f32_ptr(tail),
        _as_i64_ptr(qptr), cap,
    )
    if total < 0:
        raise RuntimeError("tail_candidates capacity exceeded")
    return rows, cols, tail, qptr, int(total)


_HEAD_KIND = {"int8": 0, "f32": 1, "bf16": 2}


def cand_head_dot_native(
    head, head_dtype, head_scales, rows, cols, total,
    qh_tids, qh_counts, qh_ptr,
):
    """out[m] = head-score of candidate m's (row, owning query)."""
    kind = _HEAD_KIND[head_dtype]
    f = head.shape[1]
    head_c = np.ascontiguousarray(head)
    rows = np.ascontiguousarray(rows[:total], dtype=np.int32)
    cols = np.ascontiguousarray(cols[:total], dtype=np.int32)
    qh_tids = np.ascontiguousarray(qh_tids, dtype=np.int32)
    qh_counts = np.ascontiguousarray(qh_counts, dtype=np.float32)
    qh_ptr = np.ascontiguousarray(qh_ptr, dtype=np.int64)
    if kind == 0 and head_scales is not None and len(qh_tids):
        # Fold the per-column scales into the query weights once (tiny
        # array) so the kernel gathers one array per element, not two, and
        # round to bf16 — the device head matmul rounds its query operand
        # to bf16 (ops/bm25.py:head_scores), and the exact merge compares
        # device head-top scores against these candidate head scores.
        import ml_dtypes

        qh_counts = (
            qh_counts * np.asarray(head_scales, np.float32)[qh_tids]
        ).astype(ml_dtypes.bfloat16).astype(np.float32)
        kind = 3
    scales = (
        np.ascontiguousarray(head_scales, dtype=np.float32)
        if head_scales is not None
        else np.zeros(1, dtype=np.float32)
    )
    out = np.zeros(max(total, 1), dtype=np.float32)
    _lib.cand_head_dot(
        head_c.ctypes.data_as(ctypes.c_void_p), kind, _as_f32_ptr(scales),
        f, _as_i32_ptr(rows), _as_i32_ptr(cols), total,
        _as_i32_ptr(qh_tids), _as_f32_ptr(qh_counts), _as_i64_ptr(qh_ptr),
        _as_f32_ptr(out),
    )
    return out[:total]


def transpose_i8_native(head: np.ndarray) -> np.ndarray:
    """Blocked (R, F) -> (F, R) int8 transpose copy."""
    r, f = head.shape
    src = np.ascontiguousarray(head)
    dst = np.empty((f, r), dtype=np.int8)
    p8 = ctypes.POINTER(ctypes.c_int8)
    _lib.transpose_i8(
        src.ctypes.data_as(p8), r, f, dst.ctypes.data_as(p8)
    )
    return dst


def cand_head_dot_t_native(
    head_t, head_scales, rows, c_ptr, total, qh_tids, qh_counts, qh_ptr
):
    """Candidate head scores from the term-major (F, R) int8 head copy.

    Bit-identical to cand_head_dot_native's folded int8 path (same
    per-candidate term-order accumulation), but streams head columns
    forward instead of gathering rows — ~3x faster at bench scale.
    """
    f, r = head_t.shape
    rows = np.ascontiguousarray(rows[:total], dtype=np.int32)
    qh_tids = np.ascontiguousarray(qh_tids, dtype=np.int32)
    qh_counts = np.ascontiguousarray(qh_counts, dtype=np.float32)
    qh_ptr = np.ascontiguousarray(qh_ptr, dtype=np.int64)
    nq = len(qh_ptr) - 1
    c_ptr = np.ascontiguousarray(c_ptr, dtype=np.int64)
    if len(c_ptr) > nq + 1:
        # Batch padding: trailing ptr entries repeat the total.
        c_ptr = np.ascontiguousarray(c_ptr[: nq + 1])
    elif len(c_ptr) < nq + 1:
        c_ptr = np.concatenate(
            [c_ptr, np.full(nq + 1 - len(c_ptr), c_ptr[-1], c_ptr.dtype)]
        )
    if head_scales is not None and len(qh_tids):
        # bf16-round the folded weights for device-consistent head scores
        # (see cand_head_dot_native).
        import ml_dtypes

        qh_counts = (
            qh_counts * np.asarray(head_scales, np.float32)[qh_tids]
        ).astype(ml_dtypes.bfloat16).astype(np.float32)
    out = np.zeros(max(total, 1), dtype=np.float32)
    p8 = ctypes.POINTER(ctypes.c_int8)
    _lib.cand_head_dot_t(
        np.ascontiguousarray(head_t).ctypes.data_as(p8), r,
        _as_i32_ptr(rows), _as_i64_ptr(c_ptr), nq,
        _as_i32_ptr(qh_tids), _as_f32_ptr(qh_counts), _as_i64_ptr(qh_ptr),
        _as_f32_ptr(out),
    )
    return out[:total]


def pack_hybrid_int8_native(
    indptr, term_ids, tfs, doc_lengths, idf,
    rows, head_terms, vocab_size, method, k1, b, avgdl,
):
    """Fused weight + int8-head + postings pack (C++).

    Computes the same (head, scales, post_ptr, post_rows, post_weights)
    arrays as builder.compute_weights_flat + layout.pack_flat with
    head_dtype='int8' — bit-identical float32 op order — in two O(nnz)
    passes with no intermediate weight array and no argsort.
    """
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    term_ids = np.ascontiguousarray(term_ids, dtype=np.int32)
    tfs = np.ascontiguousarray(tfs, dtype=np.float32)
    doc_lengths = np.ascontiguousarray(doc_lengths, dtype=np.float32)
    idf = np.ascontiguousarray(idf, dtype=np.float32)
    ndocs = len(indptr) - 1
    f = int(head_terms)
    n_tail_terms = max(vocab_size - f, 0)
    tail_cap = (
        int(np.count_nonzero(term_ids >= f)) if term_ids.size else 0
    )
    head = np.empty((rows, f), dtype=np.int8)
    scales = np.empty(f, dtype=np.float32)
    post_ptr = np.zeros(n_tail_terms + 1, dtype=np.int64)
    post_rows = np.empty(max(tail_cap, 1), dtype=np.int32)
    post_weights = np.empty(max(tail_cap, 1), dtype=np.float32)
    got = _lib.pack_hybrid_int8(
        _as_i64_ptr(indptr), ndocs, rows,
        _as_i32_ptr(term_ids), _as_f32_ptr(tfs), _as_f32_ptr(doc_lengths),
        _as_f32_ptr(idf), f, vocab_size,
        0 if method == "bm25" else 1,
        float(k1), float(b), float(avgdl),
        head.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        _as_f32_ptr(scales), _as_i64_ptr(post_ptr),
        _as_i32_ptr(post_rows), _as_f32_ptr(post_weights), tail_cap,
    )
    if got != tail_cap:
        raise RuntimeError(
            f"pack_hybrid_int8 tail mismatch: {got} != {tail_cap}"
        )
    return head, scales, post_ptr, post_rows[:tail_cap], post_weights[:tail_cap]


def pack_hybrid_int4_native(
    indptr, term_ids, tfs, doc_lengths, idf,
    rows, head_terms, vocab_size, method, k1, b, avgdl,
):
    """Fused weight + int4-head + postings pack (C++) — the int4
    counterpart of :func:`pack_hybrid_int8_native`, bit-identical to the
    NumPy pack_flat int4 path (unsigned nibble codes, signed scales)."""
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    term_ids = np.ascontiguousarray(term_ids, dtype=np.int32)
    tfs = np.ascontiguousarray(tfs, dtype=np.float32)
    doc_lengths = np.ascontiguousarray(doc_lengths, dtype=np.float32)
    idf = np.ascontiguousarray(idf, dtype=np.float32)
    ndocs = len(indptr) - 1
    f = int(head_terms)
    fp = (f + 1) // 2
    n_tail_terms = max(vocab_size - f, 0)
    tail_cap = (
        int(np.count_nonzero(term_ids >= f)) if term_ids.size else 0
    )
    head = np.empty((rows, fp), dtype=np.uint8)
    scales = np.empty(f, dtype=np.float32)
    post_ptr = np.zeros(n_tail_terms + 1, dtype=np.int64)
    post_rows = np.empty(max(tail_cap, 1), dtype=np.int32)
    post_weights = np.empty(max(tail_cap, 1), dtype=np.float32)
    got = _lib.pack_hybrid_int4(
        _as_i64_ptr(indptr), ndocs, rows,
        _as_i32_ptr(term_ids), _as_f32_ptr(tfs), _as_f32_ptr(doc_lengths),
        _as_f32_ptr(idf), f, vocab_size,
        0 if method == "bm25" else 1,
        float(k1), float(b), float(avgdl),
        head.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _as_f32_ptr(scales), _as_i64_ptr(post_ptr),
        _as_i32_ptr(post_rows), _as_f32_ptr(post_weights), tail_cap,
    )
    if got != tail_cap:
        raise RuntimeError(
            f"pack_hybrid_int4 tail mismatch: {got} != {tail_cap}"
        )
    return head, scales, post_ptr, post_rows[:tail_cap], post_weights[:tail_cap]


def merge_topk_native(
    head_s, head_r, c_rows, c_tot, c_ptr, total, k, tau_slack=None
):
    """Exact host merge (see postings.merge_host) in C++.

    ``tau_slack`` is the per-query prefilter slack (see
    postings.merge_tau_slack); None disables the prefilter (+inf slack).
    """
    b, kh = head_s.shape
    head_s = np.ascontiguousarray(head_s, dtype=np.float32)
    head_r = np.ascontiguousarray(head_r, dtype=np.int32)
    c_rows = np.ascontiguousarray(c_rows[:total], dtype=np.int32)
    c_tot = np.ascontiguousarray(c_tot[:total], dtype=np.float32)
    c_ptr = np.ascontiguousarray(c_ptr, dtype=np.int64)
    if tau_slack is None:
        tau_slack = np.full(b, np.inf, dtype=np.float32)
    else:
        tau_slack = np.ascontiguousarray(tau_slack, dtype=np.float32)
        if tau_slack.shape != (b,):
            raise ValueError(f"tau_slack shape {tau_slack.shape} != ({b},)")
    out_s = np.empty((b, k), dtype=np.float32)
    out_r = np.empty((b, k), dtype=np.int32)
    _lib.merge_topk(
        _as_f32_ptr(head_s), _as_i32_ptr(head_r), b, kh,
        _as_i32_ptr(c_rows), _as_f32_ptr(c_tot), _as_i64_ptr(c_ptr), k,
        _as_f32_ptr(tau_slack), _as_f32_ptr(out_s), _as_i32_ptr(out_r),
    )
    return out_s, out_r


def blake2b64(data: bytes) -> int:
    """Native blake2b digest_size=8 as a little-endian uint64 — identical
    to ``int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(),
    "little")`` (proven in tests/test_native.py)."""
    return int(_lib.henc_hash(data, len(data)))


class NativeHashingBackend:
    """Native core of osr_tpu.encoders.HashingEncoder.

    Documents arrive as '\\0'-joined utf-8 token buffers (tokenization
    stays in Python so ``re.findall(r"\\b\\w+\\b", text.lower())``
    unicode semantics are exact); featurization (unigram..ngram), blake2b
    hashing, TF counting, IDF weighting and the scatter-add all run in
    C++, threaded over documents. Rows come back UNNORMALIZED — callers
    apply the same per-row normalization as the pure-Python path.
    """

    def __init__(self, dim: int, ngrams: int, use_idf: bool):
        self.dim = int(dim)
        self._h = _lib.henc_create(self.dim, int(ngrams), int(bool(use_idf)))
        if not self._h:
            raise ValueError(f"henc_create({dim}, {ngrams}) failed")

    def __del__(self):  # pragma: no cover - interpreter teardown order
        h, self._h = getattr(self, "_h", None), None
        if h:
            try:
                _lib.henc_free(h)
            except Exception:
                pass

    @staticmethod
    def _doc_array(token_docs):
        import ctypes as ct

        n = len(token_docs)
        arr = (ct.c_char_p * n)(*token_docs)  # keeps refs for the call
        lens = np.fromiter(
            (len(d) for d in token_docs), dtype=np.int64, count=n
        )
        return arr, lens, n

    def fit(self, token_docs) -> None:
        arr, lens, n = self._doc_array(token_docs)
        _lib.henc_fit(self._h, arr, _as_i64_ptr(lens), n)

    def encode(self, token_docs) -> np.ndarray:
        """(n_docs, dim) float32, unnormalized."""
        arr, lens, n = self._doc_array(token_docs)
        out = np.zeros((n, self.dim), dtype=np.float32)
        if n:
            _lib.henc_encode(self._h, arr, _as_i64_ptr(lens), n,
                             _as_f32_ptr(out))
        return out

    def idf(self, feat_hash: int) -> float:
        return float(_lib.henc_idf(self._h, feat_hash))

    def n_docs(self) -> int:
        return int(_lib.henc_n_docs(self._h))

    def df_size(self) -> int:
        return int(_lib.henc_df_size(self._h))

    def export_df(self):
        """(keys uint64, vals int32) of the fitted df table, sorted by key
        for a deterministic on-disk artifact."""
        import ctypes as ct

        n = self.df_size()
        keys = np.empty(n, dtype=np.uint64)
        vals = np.empty(n, dtype=np.int32)
        if n:
            _lib.henc_export_df(
                self._h,
                keys.ctypes.data_as(ct.POINTER(ct.c_uint64)),
                _as_i32_ptr(vals),
            )
            order = np.argsort(keys, kind="stable")
            keys, vals = keys[order], vals[order]
        return keys, vals

    def import_df(self, keys: np.ndarray, vals: np.ndarray,
                  n_docs: int) -> None:
        import ctypes as ct

        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        vals = np.ascontiguousarray(vals, dtype=np.int32)
        if keys.shape != vals.shape or keys.ndim != 1:
            raise ValueError(
                f"df keys/vals shape mismatch: {keys.shape} vs {vals.shape}"
            )
        _lib.henc_import_df(
            self._h,
            keys.ctypes.data_as(ct.POINTER(ct.c_uint64)),
            _as_i32_ptr(vals),
            len(keys),
            int(n_docs),
        )
