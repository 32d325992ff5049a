"""Host-side tail scoring and final merge: term-at-a-time postings traversal.

The tail of the hybrid index (osr_tpu/index/layout.py) is a classic inverted
file over the RARE terms only. Scoring it is a pointer-chasing workload —
exactly what the reference's Numba CSR kernels do for the WHOLE index
(reference rag_system/core/retrieval.py:41-76) — so it runs on the host,
while the MXU handles the dense head. Because tail terms are df-bounded by
construction, a query touches ~10^2 postings, not the corpus.

Division of labor per batch (measured rationale in ops/bm25.py docstring):

1. :func:`tail_candidates_flat` (host): walk the query batch's postings,
   sum duplicate (query, row) contributions, emit a FLAT query-major
   candidate list.
2. ``ops.bm25.fused_search`` (device): head matmul + head top-k, and — on
   the device-merge path only — one flat gather of the candidates' head
   scores.
3. :func:`merge_host` (host): totals = head + tail per candidate, mask
   head-top entries that are tail-touched, exact top-k per query.

Each step dispatches to the threaded C++ runtime (native/osr_native.cc)
when built; the NumPy implementations here are the behavioral reference
(equality property-tested in tests/test_native.py).

Candidates are unique and ascending per query (duplicates summed in step
1), which the merge's membership binary-search relies on.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

# Fixed menu of flat candidate widths so the fused device program compiles
# once per width and is reused (device-merge path only; the host-merge path
# uses exact sizes). Fine steps: uploads through a remote-TPU tunnel cost
# ~30 ms/MB, so padding waste is real money.
FLAT_WIDTH_MENU = (
    4096, 16384, 65536, 131072, 196608, 262144, 327680, 393216, 458752,
    524288,
)


def pad_flat_width(n: int) -> int:
    for w in FLAT_WIDTH_MENU:
        if n <= w:
            return w
    w = FLAT_WIDTH_MENU[-1]
    while w < n:
        w += 131072
    return w


@dataclasses.dataclass
class FlatCandidates:
    """Query-major flat candidate list (optional padding at the end)."""

    rows: np.ndarray  # (M,) int32 document rows, ascending within a query
    cols: np.ndarray  # (M,) int32 owning query index
    tail: np.ndarray  # (M,) float32 summed tail contributions
    ptr: np.ndarray  # (B+1,) int64 per-query segment offsets
    total: int  # real entries; [total:] is padding


def _empty_candidates(batch_size: int, pad_to_menu: bool) -> FlatCandidates:
    m = FLAT_WIDTH_MENU[0] if pad_to_menu else 0
    return FlatCandidates(
        rows=np.zeros(m, dtype=np.int32),
        cols=np.zeros(m, dtype=np.int32),
        tail=np.zeros(m, dtype=np.float32),
        ptr=np.zeros(batch_size + 1, dtype=np.int64),
        total=0,
    )


def tail_candidates_flat(
    post_ptr: np.ndarray,  # (T+1,) int64
    post_rows: np.ndarray,  # (nnz,) int32
    post_weights: np.ndarray,  # (nnz,) float32
    tail_ids: np.ndarray,  # (Nt,) int32 tail-LOCAL ids (t - F), flat
    tail_counts: np.ndarray,  # (Nt,) float32 query term counts, flat
    tail_ptr: np.ndarray,  # (nq+1,) int64 per-query segments
    batch_size: int,
    num_rows: int,
    pad_to_menu: bool = True,
    use_native: bool = True,
) -> FlatCandidates:
    """Tail scorer: flat (query, row) candidates with summed contributions.

    Dispatches to the threaded C++ walker when available; the vectorized
    NumPy body below is the reference (one flat pass: gather each posting's
    (row, weight), multiply by the query term count, then sum duplicates per
    (query, row) via one sort — no Python-level per-query loop).
    """
    nq = len(tail_ptr) - 1
    if nq > batch_size:
        raise ValueError(f"{nq} queries exceed batch size {batch_size}")
    if len(tail_ids) == 0:
        return _empty_candidates(batch_size, pad_to_menu)

    if use_native:
        try:
            from osr_tpu.native import tail_candidates_native

            rows, cols, tail, qptr, total = tail_candidates_native(
                post_ptr, post_rows, post_weights,
                tail_ids, tail_counts, tail_ptr,
            )
            ptr = np.zeros(batch_size + 1, dtype=np.int64)
            ptr[: nq + 1] = qptr
            ptr[nq + 1 :] = qptr[-1]
            if pad_to_menu:
                m = pad_flat_width(total)
                rows = np.resize(rows[:total], m)
                cols = np.resize(cols[:total], m)
                tail = np.resize(tail[:total], m)
                rows[total:] = 0
                cols[total:] = 0
                tail[total:] = 0.0
            else:
                rows, cols, tail = rows[:total], cols[:total], tail[:total]
            return FlatCandidates(rows, cols, tail, ptr, total)
        except ImportError:
            pass

    qi = np.repeat(np.arange(nq, dtype=np.int64), np.diff(tail_ptr))
    tl = np.asarray(tail_ids, dtype=np.int64)
    ct = np.asarray(tail_counts, dtype=np.float32)

    starts = post_ptr[tl]
    df = (post_ptr[tl + 1] - starts).astype(np.int64)
    total_postings = int(df.sum())
    if total_postings == 0:
        return _empty_candidates(batch_size, pad_to_menu)

    # Flat posting indices: for each (query, term), starts[j] + 0..df[j]-1.
    ends = np.cumsum(df)
    flat = np.arange(total_postings, dtype=np.int64)
    flat += np.repeat(starts - (ends - df), df)
    rows = post_rows[flat].astype(np.int64)
    vals = post_weights[flat] * np.repeat(ct, df)
    qidx = np.repeat(qi, df)

    # Sum duplicate (query, row) pairs; unique() sorts by (query, row), so
    # the output is query-major with ascending unique rows per query.
    key = qidx * np.int64(num_rows + 1) + rows
    ukey, inv = np.unique(key, return_inverse=True)
    sums = np.bincount(inv, weights=vals).astype(np.float32)
    uq = (ukey // (num_rows + 1)).astype(np.int32)
    urow = (ukey % (num_rows + 1)).astype(np.int32)

    total = int(ukey.shape[0])
    m = pad_flat_width(total) if pad_to_menu else total
    out_rows = np.zeros(m, dtype=np.int32)
    out_cols = np.zeros(m, dtype=np.int32)
    out_tail = np.zeros(m, dtype=np.float32)
    out_rows[:total] = urow
    out_cols[:total] = uq
    out_tail[:total] = sums
    ptr = np.zeros(batch_size + 1, dtype=np.int64)
    np.cumsum(np.bincount(uq, minlength=batch_size), out=ptr[1:])
    return FlatCandidates(out_rows, out_cols, out_tail, ptr, total)


def cand_head_scores_host(
    head: np.ndarray,  # (R, F) int8 | bf16 | f32
    head_dtype: str,
    head_scales: Optional[np.ndarray],  # (F,) f32 for int8
    cand: FlatCandidates,
    head_flat_ids: np.ndarray,  # (Nh,) int32 per-query head terms, flat
    head_flat_counts: np.ndarray,  # (Nh,) float32
    head_ptr: np.ndarray,  # (nq+1,) int64
    use_native: bool = True,
    head_t: Optional[np.ndarray] = None,  # (F, R) int8 term-major copy
) -> np.ndarray:
    """Head scores of the flat candidates, computed from the host-resident
    head matrix (avoids any device gather/transfer on the host-merge path).

    When a term-major ``head_t`` copy is supplied (int8 only), the scorer
    streams head columns forward over each query's ascending candidate rows
    instead of gathering rows at random — the engine caches that copy.
    """
    total = cand.total
    if total == 0:
        return np.zeros(0, dtype=np.float32)
    if use_native:
        try:
            if head_t is not None and head_dtype == "int8":
                from osr_tpu.native import cand_head_dot_t_native

                return cand_head_dot_t_native(
                    head_t, head_scales, cand.rows, cand.ptr, total,
                    head_flat_ids, head_flat_counts, head_ptr,
                )
            from osr_tpu.native import cand_head_dot_native

            return cand_head_dot_native(
                head, head_dtype, head_scales,
                cand.rows, cand.cols, total,
                head_flat_ids, head_flat_counts, head_ptr,
            )
        except ImportError:
            pass
    # NumPy reference: (total, Qh) gather over the owning query's head terms.
    nq = len(head_ptr) - 1
    n_head = np.diff(head_ptr)
    qh_max = int(n_head.max(initial=0))
    if qh_max == 0:
        return np.zeros(total, dtype=np.float32)
    tid_pad = np.zeros((nq, qh_max), dtype=np.int64)
    cnt_pad = np.zeros((nq, qh_max), dtype=np.float32)
    rows_r = np.repeat(np.arange(nq, dtype=np.int64), n_head)
    cols_r = np.arange(len(head_flat_ids), dtype=np.int64) - np.repeat(
        head_ptr[:-1], n_head
    )
    tid_pad[rows_r, cols_r] = head_flat_ids
    cnt_pad[rows_r, cols_r] = head_flat_counts
    q = cand.cols[:total].astype(np.int64)
    w = np.asarray(
        head[cand.rows[:total][:, None], tid_pad[q]], dtype=np.float32
    )
    if head_dtype == "int8" and head_scales is not None:
        # Same numeric pipeline as the device head matmul: the query-side
        # weight (count * column scale) rounds to bf16 there
        # (ops/bm25.py:head_scores), so the merge compares head-top scores
        # and candidate totals computed with identical head-score rounding.
        return (w * _bf16(cnt_pad[q] * head_scales[tid_pad[q]])).sum(
            axis=1
        ).astype(np.float32)
    return (w * cnt_pad[q]).sum(axis=1).astype(np.float32)


def _bf16(x: np.ndarray) -> np.ndarray:
    """Round f32 to the nearest bfloat16 value (returned as f32)."""
    import ml_dtypes

    return x.astype(ml_dtypes.bfloat16).astype(np.float32)


def prepare_host_merge(layout, want_head_t: bool = True):
    """Host-side state for the exact candidate merge, shared by the flat
    and sharded engines: the host head view (int4 unpacked once to the
    same int8 values the device sees), an optional term-major int8 copy
    for the streaming candidate scorer, and the per-head-term slack bound
    for the merge prefilter (see :func:`merge_tau_slack`).

    Returns ``(host_head, host_head_dtype, head_t, slack_per_term)``.
    """
    host_head = layout.head
    host_head_dtype = layout.head_dtype
    if layout.head_dtype == "int4":
        from osr_tpu.index.layout import unpack_int4

        # Host DRAM is not the scarce resource — the int4 layout halves
        # HBM; decoded values ARE the int8 values the device matmul
        # sees, so the merge numerics stay consistent.
        host_head = unpack_int4(layout.head, layout.head_terms)
        host_head_dtype = "int8"
    head_t = None
    if want_head_t and host_head_dtype == "int8":
        try:
            from osr_tpu.native import transpose_i8_native

            head_t = transpose_i8_native(host_head)
        except ImportError:
            pass
    # Per-head-term slack for the merge prefilter: an upper bound on the
    # per-term device/host head-dot discrepancy. The device rounds each
    # scaled query weight to bf16 (half-ulp = 2^-8) and both sides
    # accumulate F f32 terms; head terms can mix signs, so the bound
    # scales with max|w| * scale per term, never with the score.
    ht = max(int(layout.head_terms), 1)
    if host_head_dtype == "int8":
        rel = 2.0**-8 + 4.0 * ht * 2.0**-24
        wmax = 15.0 if layout.head_dtype == "int4" else 127.0
        slack = (
            rel * wmax * np.asarray(layout.head_scales, np.float32)
        ).astype(np.float32)
    else:
        # bf16/f32 heads: same stored values on both sides; device error
        # is bf16 products (bf16 mode) or f32 HIGHEST (f32 mode).
        rel = (
            2.0**-8 + 4.0 * ht * 2.0**-24
            if host_head_dtype == "bf16"
            else 2.0**-22 + 4.0 * ht * 2.0**-24
        )
        # Column-wise max|w| in row blocks: a full f32 copy of the head
        # would transiently cost 2 * R*F*4 bytes (tens of GB at 1M+
        # docs) just to reduce to an (F,) vector.
        hmax = np.zeros(host_head.shape[1], dtype=np.float32)
        for lo in range(0, host_head.shape[0], 65536):
            blk = np.abs(host_head[lo : lo + 65536].astype(np.float32))
            np.maximum(hmax, blk.max(axis=0, initial=0.0), out=hmax)
        slack = (rel * hmax).astype(np.float32)
    return host_head, host_head_dtype, head_t, slack


def merge_tau_slack(
    slack_per_term: np.ndarray,  # (F,) f32 per-head-term error bound
    head_flat_ids: np.ndarray,  # (Nh,) int32 per-query head terms, flat
    head_flat_counts: np.ndarray,  # (Nh,) float32
    head_ptr: np.ndarray,  # (nq+1,)
) -> np.ndarray:
    """Per-query upper bound on |device head score - host head score|.

    The device head dot rounds each scaled query weight to bf16
    (ops/bm25.py:head_scores), so per term the discrepancy vs the host f32
    dot is <= 2^-8 * |q_j * s_j| * |w_ij| (bf16 half-ulp: 8-bit
    significand); f32 accumulation order adds
    <= F * 2^-24 relative to sum(|terms|) on each side. Head terms can mix
    signs (builder.py places non-positive-IDF terms in the head), so under
    cancellation the band scales with sum(|terms|), NOT with |score| — a
    score-relative slack is unsound. Callers pass
    ``slack_per_term[f] = REL_EPS * max|w_:f| * s_f`` (engine caches it);
    this reduces it per query: ``slack_q = sum_j |count_j| * slack[id_j]``.
    """
    contrib = np.abs(head_flat_counts.astype(np.float32)) * slack_per_term[
        head_flat_ids
    ]
    csum = np.concatenate([[0.0], np.cumsum(contrib, dtype=np.float64)])
    ptr = np.asarray(head_ptr, dtype=np.int64)
    return (csum[ptr[1:]] - csum[ptr[:-1]]).astype(np.float32)


def filter_candidates_by_tau(
    cand: FlatCandidates,
    head_scores: np.ndarray,  # (B, k) device head top-k scores (desc)
    head_rows: np.ndarray,  # (B, k) int32 device head top-k rows
    k: int,
    tau_slack: np.ndarray,  # (B,) f32 device/host head rounding bound
    num_rows: int,
) -> FlatCandidates:
    """Exact pre-head-dot candidate filter (the 10M-doc host cure).

    A doc OUTSIDE the device head top-k has device head score <= tau0 (the
    k-th head-only score, by definition of that top-k), so its host-channel
    reported total is <= tau0 + slack_q + tail. It can enter the final
    top-k only if that bound reaches tau_final, the k-th best reported
    total. We lower-bound tau_final from the head-top docs alone:
    each head-top doc's reported total is >= head_score_i - slack_q +
    tail_i (tail_i found by binary search into the candidate list, 0 if
    untouched), so tau_lb = k-th largest of those is <= tau_final. Drop
    candidates with tau0 + slack_q + tail < tau_lb, i.e.
    ``tail < tau_lb - tau0 - slack_q`` — EXACT: a dropped candidate's
    reported total is strictly below tau_final, so it cannot displace any
    top-k member even under ties. Candidates whose row IS in the head
    top-k are always retained (their exact totals feed the merge's masked
    union channel; their device score can exceed tau0).

    Measured at 10M docs / F=2048 (tools/profile_host_scale.py): theta =
    tau_final - tau0 has median ~9.6 while 90% of candidates carry tail
    < 8, so ~90% of the candidate head-dot + merge work vanishes. At FiQA
    scale candidates are few and the engine keeps the overlapped
    dispatch-time head-dot instead (engine gates on candidates/query).
    """
    b, kh = head_scores.shape
    total = cand.total
    if total == 0 or kh < k:
        return cand
    nq = len(cand.ptr) - 1
    tails = cand.tail[:total]
    cols = cand.cols[:total]
    rows = cand.rows[:total]

    # Head-top tails via one global binary search (same key trick as the
    # merge's touched-mask).
    key_flat = cols.astype(np.int64) * np.int64(num_rows + 1) + rows
    bq = min(b, nq)
    head_keys = (
        np.repeat(np.arange(bq, dtype=np.int64), kh)
        * np.int64(num_rows + 1)
        + head_rows[:bq].ravel()
    )
    pos = np.searchsorted(key_flat, head_keys)
    in_b = pos < total
    touched = np.zeros(bq * kh, dtype=bool)
    touched[in_b] = key_flat[pos[in_b]] == head_keys[in_b]
    top_tail = np.zeros(bq * kh, dtype=np.float32)
    top_tail[touched] = tails[pos[touched]]
    top_tail = top_tail.reshape(bq, kh)

    slack = np.asarray(tau_slack, dtype=np.float32)
    if len(slack) < bq:
        # tau_slack covers real queries only; bucket-padded queries have
        # -inf head scores, so their theta is -inf (keep-all) regardless.
        slack = np.concatenate(
            [slack, np.full(bq - len(slack), np.inf, np.float32)]
        )
    slack = slack[:bq]
    with np.errstate(invalid="ignore"):
        lb_totals = (
            head_scores[:bq].astype(np.float32)
            - slack[:, None]
            + top_tail
        )
        # k-th largest of the k head-top lower bounds per query.
        tau_lb = -np.partition(-lb_totals, k - 1, axis=1)[:, k - 1]
        tau0 = head_scores[:bq, k - 1].astype(np.float32)
        theta = tau_lb - tau0 - slack - 1e-6
    # Keep everything for queries where the bound is vacuous or undefined
    # (padded queries, < k finite head entries, theta <= 0).
    theta = np.where(np.isfinite(theta), theta, -np.inf)
    theta_full = np.full(nq, -np.inf, dtype=np.float32)
    theta_full[:bq] = theta

    keep = tails >= theta_full[cols]
    # Retain head-top rows' candidates unconditionally.
    keep[pos[touched]] = True
    if keep.all():
        return cand
    new_rows = rows[keep]
    new_cols = cols[keep]
    new_tail = tails[keep]
    new_total = int(new_rows.shape[0])
    ptr = np.zeros(nq + 1, dtype=np.int64)
    np.cumsum(np.bincount(new_cols, minlength=nq), out=ptr[1:])
    return FlatCandidates(new_rows, new_cols, new_tail, ptr, new_total)


def merge_host(
    head_scores: np.ndarray,  # (B, k) device head top-k scores
    head_rows: np.ndarray,  # (B, k) int32 device head top-k rows
    cand: FlatCandidates,
    cand_head: np.ndarray,  # (>= total,) candidate head scores
    num_rows: int,
    k: int,
    use_native: bool = True,
    tau_slack: Optional[np.ndarray] = None,  # (B,) f32; None = no prefilter
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact final top-k per query: (head top-k) UNION (candidate totals).

    Head-top entries that are tail-touched are masked (the candidate
    channel holds their exact totals); see ops/bm25.py:fused_search for the
    exactness argument. ``tau_slack`` enables the candidate prefilter with
    a sound per-query rounding bound (:func:`merge_tau_slack`); pass zeros
    when ``cand_head`` comes from the SAME device score matrix as
    ``head_scores`` (no discrepancy), and None to disable the prefilter
    when the provenance is unknown.
    """
    b, kh = head_scores.shape
    total = cand.total
    totals = cand_head[:total].astype(np.float32) + cand.tail[:total]
    if tau_slack is not None and len(tau_slack) < b:
        # head_scores is padded to the batch bucket; padded queries have
        # -inf heads so their tau is -inf regardless of the slack value.
        tau_slack = np.concatenate(
            [tau_slack, np.full(b - len(tau_slack), np.inf, np.float32)]
        )

    if use_native:
        try:
            from osr_tpu.native import merge_topk_native

            ptr = cand.ptr
            if len(ptr) != b + 1:
                ptr = np.concatenate(
                    [ptr, np.full(b + 1 - len(ptr), ptr[-1], ptr.dtype)]
                )
            return merge_topk_native(
                np.asarray(head_scores), np.asarray(head_rows),
                cand.rows, totals, ptr, total, k, tau_slack=tau_slack,
            )
        except ImportError:
            pass

    # Tail-touched membership for head-top rows: one global binary search
    # over the (query, row)-sorted flat keys.
    key_flat = (
        cand.cols[:total].astype(np.int64) * np.int64(num_rows + 1)
        + cand.rows[:total]
    )
    head_keys = (
        np.repeat(np.arange(b, dtype=np.int64), kh) * np.int64(num_rows + 1)
        + head_rows.ravel()
    )
    pos = np.searchsorted(key_flat, head_keys)
    touched = np.zeros(b * kh, dtype=bool)
    in_b = pos < total
    touched[in_b] = key_flat[pos[in_b]] == head_keys[in_b]
    head_masked = np.where(
        touched.reshape(b, kh), -np.inf, head_scores
    ).astype(np.float32)

    # Candidate prefilter (mirrors the C++ merge): the final k-th TOTAL is
    # >= tau0 = the k-th head-only score, so candidates with total < tau0
    # (minus the caller's per-query rounding-bound slack, see
    # merge_tau_slack) cannot enter the top-k. Only valid when the head
    # contributes >= k entries and the caller supplied a slack.
    cols_t = cand.cols[:total]
    rows_t = cand.rows[:total]
    if total and kh >= k and tau_slack is not None:
        tau0 = head_scores[:, k - 1]
        cand_tau = tau0 - tau_slack.astype(np.float32) - 1e-6
        tau = np.where(np.isfinite(cand_tau), cand_tau, -np.inf).astype(
            np.float32
        )
        keep = totals >= tau[cols_t]
        totals = totals[keep]
        cols_t = cols_t[keep]
        rows_t = rows_t[keep]
        total = int(keep.sum())

    # Pad candidate totals to (B, Cmax) (row-major copy, no device work).
    cmax = (
        int(np.bincount(cols_t, minlength=b).max(initial=0)) if total else 0
    )
    cand_s = np.full((b, cmax), -np.inf, dtype=np.float32)
    cand_r = np.zeros((b, cmax), dtype=np.int32)
    if total:
        seg_ptr = np.zeros(b + 1, dtype=np.int64)
        np.cumsum(np.bincount(cols_t, minlength=b), out=seg_ptr[1:])
        col = np.arange(total, dtype=np.int64) - seg_ptr[cols_t]
        cand_s[cols_t, col] = totals
        cand_r[cols_t, col] = rows_t

    all_s = np.concatenate([head_masked, cand_s], axis=1)
    all_r = np.concatenate([head_rows.astype(np.int32), cand_r], axis=1)
    kk = min(k, all_s.shape[1])
    if kk < all_s.shape[1]:
        part = np.argpartition(-all_s, kk - 1, axis=1)[:, :kk]
    else:
        part = np.broadcast_to(
            np.arange(all_s.shape[1]), (b, all_s.shape[1])
        )
    part_s = np.take_along_axis(all_s, part, axis=1)
    order = np.argsort(-part_s, axis=1, kind="stable")
    top_s = np.take_along_axis(part_s, order, axis=1)
    top_r = np.take_along_axis(
        np.take_along_axis(all_r, part, axis=1), order, axis=1
    )
    if top_s.shape[1] < k:
        # Match the native merge's fixed (B, k) contract: pad short result
        # sets with (-inf, row 0) sentinels (callers filter on score > 0).
        pad = k - top_s.shape[1]
        top_s = np.pad(top_s, ((0, 0), (0, pad)), constant_values=-np.inf)
        top_r = np.pad(top_r, ((0, 0), (0, pad)))
    return top_s, top_r


def dense_tail_scores(
    post_ptr: np.ndarray,
    post_rows: np.ndarray,
    post_weights: np.ndarray,
    tail_ids: np.ndarray,  # (Nt,) int32 LOCAL ids, flat
    tail_counts: np.ndarray,
    tail_ptr: np.ndarray,  # (nq+1,)
    num_rows: int,
) -> np.ndarray:
    """(nq, num_rows) dense tail score matrix — the oracle/test path."""
    nq = len(tail_ptr) - 1
    out = np.zeros((nq, num_rows), dtype=np.float32)
    for q in range(nq):
        lo, hi = int(tail_ptr[q]), int(tail_ptr[q + 1])
        for t, cnt in zip(tail_ids[lo:hi], tail_counts[lo:hi]):
            a, z = int(post_ptr[t]), int(post_ptr[t + 1])
            np.add.at(out[q], post_rows[a:z], post_weights[a:z] * float(cnt))
    return out
