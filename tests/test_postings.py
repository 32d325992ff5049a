"""Host tail scorer + merge (osr_tpu/index/postings.py) tests.

Both implementations are covered: the vectorized NumPy reference and —
when the C++ runtime is built — the threaded native path, which must be
value-identical.
"""

import numpy as np
import pytest

from osr_tpu.index.postings import (
    FLAT_WIDTH_MENU,
    FlatCandidates,
    dense_tail_scores,
    merge_host,
    merge_tau_slack,
    pad_flat_width,
    tail_candidates_flat,
)

try:
    import osr_tpu.native  # noqa: F401

    BACKENDS = [False, True]
except ImportError:  # pragma: no cover
    BACKENDS = [False]


def _random_postings(rng, n_terms, n_rows, max_df):
    dfs = rng.randint(0, max_df + 1, n_terms)
    ptr = np.zeros(n_terms + 1, dtype=np.int64)
    np.cumsum(dfs, out=ptr[1:])
    rows = np.concatenate(
        [np.sort(rng.choice(n_rows, size=d, replace=False)) for d in dfs]
    ).astype(np.int32) if dfs.sum() else np.zeros(0, np.int32)
    w = rng.rand(int(dfs.sum())).astype(np.float32) + 0.01
    return ptr, rows, w


def _flat_queries(tail_lists, count_lists):
    ptr = np.zeros(len(tail_lists) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in tail_lists], out=ptr[1:])
    tids = (
        np.concatenate(tail_lists).astype(np.int32)
        if ptr[-1]
        else np.zeros(0, np.int32)
    )
    counts = (
        np.concatenate(count_lists).astype(np.float32)
        if ptr[-1]
        else np.zeros(0, np.float32)
    )
    return tids, counts, ptr


def _dense_from_flat(cand, n_rows, nq):
    out = np.zeros((nq, n_rows), dtype=np.float32)
    for i in range(cand.total):
        out[cand.cols[i], cand.rows[i]] += cand.tail[i]
    return out


@pytest.mark.parametrize("use_native", BACKENDS)
def test_tail_candidates_match_dense_oracle(use_native):
    rng = np.random.RandomState(0)
    n_terms, n_rows = 40, 64
    ptr, rows, w = _random_postings(rng, n_terms, n_rows, max_df=12)
    tail_lists = [
        np.sort(rng.choice(n_terms, size=rng.randint(0, 6), replace=False))
        for _ in range(7)
    ]
    count_lists = [
        rng.randint(1, 4, size=len(t)).astype(np.float32)
        for t in tail_lists
    ]
    tids, counts, qptr = _flat_queries(tail_lists, count_lists)
    cand = tail_candidates_flat(
        ptr, rows, w, tids, counts, qptr,
        batch_size=8, num_rows=n_rows, use_native=use_native,
    )
    want = dense_tail_scores(ptr, rows, w, tids, counts, qptr, n_rows)
    got = _dense_from_flat(cand, n_rows, 7)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # query-major, rows unique + ascending per query; ptr consistent
    for q in range(7):
        lo, hi = cand.ptr[q], cand.ptr[q + 1]
        seg = cand.rows[lo:hi]
        assert (cand.cols[lo:hi] == q).all()
        assert (np.diff(seg) > 0).all()
    assert cand.ptr[7] == cand.total


@pytest.mark.parametrize("use_native", BACKENDS)
def test_tail_candidates_sums_duplicate_rows(use_native):
    """Two query terms sharing a document must sum into ONE candidate."""
    ptr = np.array([0, 2, 4], dtype=np.int64)
    rows = np.array([3, 7, 3, 9], dtype=np.int32)
    w = np.array([1.0, 2.0, 10.0, 20.0], dtype=np.float32)
    tids, counts, qptr = _flat_queries(
        [np.array([0, 1])], [np.array([1.0, 2.0], np.float32)]
    )
    cand = tail_candidates_flat(
        ptr, rows, w, tids, counts, qptr,
        batch_size=1, num_rows=16, use_native=use_native,
    )
    got = {
        int(cand.rows[i]): float(cand.tail[i]) for i in range(cand.total)
    }
    assert got == {3: 1.0 + 20.0, 7: 2.0, 9: 40.0}


def test_tail_candidates_empty():
    ptr = np.zeros(1, dtype=np.int64)
    tids, counts, qptr = _flat_queries(
        [np.zeros(0, np.int64)] * 3, [np.zeros(0, np.float32)] * 3
    )
    cand = tail_candidates_flat(
        ptr, np.zeros(0, np.int32), np.zeros(0, np.float32),
        tids, counts, qptr, batch_size=4, num_rows=10,
    )
    assert cand.total == 0
    assert (cand.ptr == 0).all()


def test_pad_flat_width_menu():
    assert pad_flat_width(1) == FLAT_WIDTH_MENU[0]
    assert pad_flat_width(FLAT_WIDTH_MENU[0] + 1) == FLAT_WIDTH_MENU[1]
    assert pad_flat_width(FLAT_WIDTH_MENU[-1] + 1) == (
        FLAT_WIDTH_MENU[-1] + 131072
    )


def test_batch_overflow_raises():
    ptr = np.zeros(1, dtype=np.int64)
    tids, counts, qptr = _flat_queries(
        [np.zeros(0, np.int64)] * 5, [np.zeros(0, np.float32)] * 5
    )
    with pytest.raises(ValueError):
        tail_candidates_flat(
            ptr, np.zeros(0, np.int32), np.zeros(0, np.float32),
            tids, counts, qptr, batch_size=4, num_rows=10,
        )


def _build_case(rng, n_rows, b, k):
    full_head = rng.randn(b, n_rows).astype(np.float32)
    tail = np.zeros((b, n_rows), dtype=np.float32)
    for q in range(b):
        touched = rng.choice(n_rows, size=rng.randint(0, 12), replace=False)
        tail[q, touched] = rng.rand(len(touched)).astype(np.float32) + 0.01
    rows_l, cols_l, tails_l = [], [], []
    ptr = np.zeros(b + 1, dtype=np.int64)
    for q in range(b):
        t = np.nonzero(tail[q])[0]
        rows_l.extend(t.tolist())
        cols_l.extend([q] * len(t))
        tails_l.extend(tail[q, t].tolist())
        ptr[q + 1] = ptr[q] + len(t)
    total = len(rows_l)
    m = pad_flat_width(total)
    cand = FlatCandidates(
        rows=np.pad(np.asarray(rows_l, np.int32), (0, m - total)),
        cols=np.pad(np.asarray(cols_l, np.int32), (0, m - total)),
        tail=np.pad(np.asarray(tails_l, np.float32), (0, m - total)),
        ptr=ptr,
        total=total,
    )
    cand_head = np.zeros(m, dtype=np.float32)
    cand_head[:total] = full_head[cand.cols[:total], cand.rows[:total]]
    head_rows = np.argsort(-full_head, axis=1)[:, :k].astype(np.int32)
    head_scores = np.take_along_axis(full_head, head_rows, axis=1)
    return full_head, tail, cand, cand_head, head_scores, head_rows


@pytest.mark.parametrize("use_native", BACKENDS)
def test_merge_host_exact_against_bruteforce(use_native):
    """merge_host must reproduce argsort over (head + tail) totals."""
    rng = np.random.RandomState(3)
    n_rows, b, k = 50, 6, 8
    full_head, tail, cand, cand_head, head_s, head_r = _build_case(
        rng, n_rows, b, k
    )
    got_s, got_r = merge_host(
        head_s, head_r, cand, cand_head, n_rows, k, use_native=use_native
    )
    want = full_head + tail
    for q in range(b):
        order = np.argsort(-want[q], kind="stable")[:k]
        np.testing.assert_allclose(
            got_s[q], want[q][order], rtol=1e-6, atol=1e-7
        )
        assert len(set(got_r[q].tolist())) == k  # no duplicate docs
        # membership identical up to exact ties
        np.testing.assert_allclose(
            want[q][got_r[q]], want[q][order], rtol=1e-6
        )


@pytest.mark.parametrize("use_native", BACKENDS)
def test_merge_host_pads_short_results_to_k(use_native):
    """Both backends return a fixed (B, k) with (-inf, row 0) sentinel
    padding when fewer than k candidates exist (engine filters score>0)."""
    head_scores = np.array([[3.0, 2.0]], dtype=np.float32)
    head_rows = np.array([[4, 1]], dtype=np.int32)
    cand = FlatCandidates(
        rows=np.array([2], np.int32),
        cols=np.array([0], np.int32),
        tail=np.array([0.5], np.float32),
        ptr=np.array([0, 1], np.int64),
        total=1,
    )
    cand_head = np.array([1.0], np.float32)
    s, r = merge_host(
        head_scores, head_rows, cand, cand_head, 10, 7,
        use_native=use_native,
    )
    assert s.shape == (1, 7) and r.shape == (1, 7)
    np.testing.assert_allclose(s[0, :3], [3.0, 2.0, 1.5])
    assert np.all(np.isneginf(s[0, 3:]))
    np.testing.assert_array_equal(r[0, 3:], 0)


def test_engine_rejects_unknown_topk_mode():
    from osr_tpu.index.builder import SparseIndexBuilder
    from osr_tpu.retrieval.engine import SparseSearchEngine

    idx = SparseIndexBuilder().build(
        {"d1": {"text": "alpha beta gamma"}, "d2": {"text": "beta delta"}}
    )
    with pytest.raises(ValueError, match="topk_mode"):
        SparseSearchEngine(idx, topk_mode="fast")
    with pytest.raises(ValueError, match="head_backend"):
        SparseSearchEngine(idx, head_backend="mosaic")
    # On the CPU test platform 'auto' must resolve to the XLA chain
    # (Mosaic has no CPU target).
    assert SparseSearchEngine(idx).head_backend == "xla"


@pytest.mark.parametrize("use_native", BACKENDS)
def test_merge_host_no_candidates(use_native):
    head_scores = np.array([[3.0, 2.0, 1.0]], dtype=np.float32)
    head_rows = np.array([[5, 2, 9]], dtype=np.int32)
    cand = FlatCandidates(
        rows=np.zeros(16, np.int32),
        cols=np.zeros(16, np.int32),
        tail=np.zeros(16, np.float32),
        ptr=np.zeros(2, np.int64),
        total=0,
    )
    s, r = merge_host(
        head_scores, head_rows, cand, np.zeros(16, np.float32), 20, 3,
        use_native=use_native,
    )
    np.testing.assert_array_equal(s, head_scores)
    np.testing.assert_array_equal(r, head_rows)


@pytest.mark.skipif(len(BACKENDS) < 2, reason="native lib not built")
def test_cand_head_scores_transposed_equals_numpy():
    """The term-major streaming scorer (head_t path) matches the NumPy
    reference; transpose_i8_native round-trips exactly."""
    pytest.importorskip("osr_tpu.native")
    from osr_tpu.native import transpose_i8_native
    from osr_tpu.index.postings import cand_head_scores_host

    rng = np.random.RandomState(7)
    r_, f, b = 41, 13, 6
    head = rng.randint(-127, 128, (r_, f)).astype(np.int8)
    head_t = transpose_i8_native(head)
    np.testing.assert_array_equal(head_t, head.T)
    scales = (rng.rand(f).astype(np.float32) + 0.1) / 127
    hl = [
        np.sort(rng.choice(f, size=rng.randint(0, 5), replace=False))
        for _ in range(b)
    ]
    cl = [rng.randint(1, 3, len(t)).astype(np.float32) for t in hl]
    tids, counts, hptr = _flat_queries(hl, cl)
    # Proper query-major candidates with a consistent ptr.
    cols = np.sort(rng.randint(0, b, 23)).astype(np.int32)
    rows = rng.randint(0, r_, 23).astype(np.int32)
    ptr = np.zeros(b + 1, np.int64)
    np.cumsum(np.bincount(cols, minlength=b), out=ptr[1:])
    cand = FlatCandidates(
        rows=rows, cols=cols, tail=np.zeros(23, np.float32), ptr=ptr, total=23
    )
    got_t = cand_head_scores_host(
        head, "int8", scales, cand, tids, counts, hptr,
        use_native=True, head_t=head_t,
    )
    want = cand_head_scores_host(
        head, "int8", scales, cand, tids, counts, hptr, use_native=False
    )
    np.testing.assert_allclose(got_t, want, rtol=1e-6)


def test_cand_head_scores_host_native_equals_numpy():
    from osr_tpu.index.postings import cand_head_scores_host

    rng = np.random.RandomState(1)
    r_, f = 30, 12
    b = 5
    for dtype in ("int8", "f32"):
        if dtype == "int8":
            head = rng.randint(-127, 128, (r_, f)).astype(np.int8)
            scales = (rng.rand(f).astype(np.float32) + 0.1) / 127
        else:
            head = rng.randn(r_, f).astype(np.float32)
            scales = None
        # queries with 0..4 head terms each
        hl = [
            np.sort(rng.choice(f, size=rng.randint(0, 5), replace=False))
            for _ in range(b)
        ]
        cl = [rng.randint(1, 3, len(t)).astype(np.float32) for t in hl]
        tids, counts, hptr = _flat_queries(hl, cl)
        total = 17
        cand = FlatCandidates(
            rows=rng.randint(0, r_, total).astype(np.int32),
            cols=np.sort(rng.randint(0, b, total)).astype(np.int32),
            tail=np.zeros(total, np.float32),
            ptr=np.zeros(b + 1, np.int64),  # unused here
            total=total,
        )
        got_native = cand_head_scores_host(
            head, dtype, scales, cand, tids, counts, hptr, use_native=True
        )
        got_numpy = cand_head_scores_host(
            head, dtype, scales, cand, tids, counts, hptr, use_native=False
        )
        np.testing.assert_allclose(got_native, got_numpy, rtol=1e-6)


@pytest.mark.skipif(len(BACKENDS) < 2, reason="native lib not built")
def test_native_encode_matches_python():
    from osr_tpu.index.tokenizer import Tokenizer
    from osr_tpu.retrieval.encoding import QueryEncoder

    vocab = {t: i for i, t in enumerate(["zeta", "alpha", "beta", "g_1"])}
    tok = Tokenizer(vocab)
    enc = QueryEncoder(tok)
    texts = ["Alpha BETA alpha!", "g_1, zeta; unknown", "", "   ", "beta"]
    tids_n, counts_n, ptr_n = enc.encode_flat(texts)
    assert enc._native_vocab is not None
    # Force the Python path via a fresh encoder with native disabled.
    enc2 = QueryEncoder(tok)
    enc2._native_tried = True
    tids_p, counts_p, ptr_p = enc2.encode_flat(texts)
    np.testing.assert_array_equal(tids_n, tids_p)
    np.testing.assert_array_equal(counts_n, counts_p)
    np.testing.assert_array_equal(ptr_n, ptr_p)


@pytest.mark.parametrize("use_native", BACKENDS)
def test_merge_tau_filter_keeps_band_edge_head_tops(use_native):
    """The tau0 candidate prefilter must never drop a MASKED head-top
    whose host-computed total sits just below tau0 (the device/host bf16
    rounding band, DEVELOPMENT.md merge numerics note): the 1% slack
    covers it."""
    k = 3
    # Head top-3 scores 10, 9, 8 -> tau0 = 8. Doc 5 (score 8) is
    # tail-touched; its host-channel total is 7.97 (-0.4% band, tail
    # included) — still within the slack, must be kept and ranked.
    head_scores = np.array([[10.0, 9.0, 8.0]], dtype=np.float32)
    head_rows = np.array([[1, 2, 5]], dtype=np.int32)
    cand = FlatCandidates(
        rows=np.array([5, 7], np.int32),
        cols=np.array([0, 0], np.int32),
        tail=np.array([0.01, 0.5], np.float32),
        ptr=np.array([0, 2], np.int64),
        total=2,
    )
    # host head-dot of doc 5 rounds low: 7.96 + 0.01 tail = 7.97 < tau0=8
    # doc 7 is a genuine low-scorer (total 1.5) -> filtered.
    cand_head = np.array([7.96, 1.0], np.float32)
    s, r = merge_host(
        head_scores, head_rows, cand, cand_head, 10, k,
        use_native=use_native,
    )
    assert r[0].tolist() == [1, 2, 5]
    np.testing.assert_allclose(s[0], [10.0, 9.0, 7.97], rtol=1e-6)


@pytest.mark.parametrize("use_native", BACKENDS)
def test_merge_tau_filter_matches_unfiltered_at_scale(use_native):
    """Property check on bigger random pools: the filtered merge equals a
    naive argsort of (head + tail) totals (same contract as the
    bruteforce test, at a size where the filter actually drops most
    candidates)."""
    rng = np.random.RandomState(11)
    n_rows, b, k = 400, 8, 10
    full_head, tail, cand, cand_head, head_s, head_r = _build_case(
        rng, n_rows, b, k
    )
    got_s, got_r = merge_host(
        head_s, head_r, cand, cand_head, n_rows, k, use_native=use_native
    )
    want = full_head + tail
    for q in range(b):
        order = np.argsort(-want[q], kind="stable")[:k]
        np.testing.assert_allclose(
            got_s[q], want[q][order], rtol=1e-6, atol=1e-7
        )


@pytest.mark.parametrize("use_native", BACKENDS)
def test_merge_prefilter_sound_under_cancellation(use_native):
    """The prefilter slack must scale with sum(|head terms|), not |tau0|:
    with mixed-sign head terms, tau0 can be tiny (near-cancellation) while
    the device/host rounding band is large. A candidate that IS the true
    top doc sits just below tau0 by more than 1%*|tau0| but inside the
    absolute rounding band — the per-query slack must keep it."""
    k = 2
    # Device-reported head top-k: tau0 = 0.010 (cancellation of +/-100s).
    # Row 5 is TAIL-TOUCHED: it is masked from the head channel and its
    # exact total rides the candidate channel only.
    head_scores = np.array([[0.012, 0.010]], dtype=np.float32)
    head_rows = np.array([[3, 5]], dtype=np.int32)
    # Host recomputes row 5's head dot as 0.009 (device said 0.010 — the
    # 0.001 gap exceeds 1%*|tau0| = 0.0001 but is well inside a rounding
    # band of 0.05 derived from sum(|q_j*s_j*w_max|) ~ 200 under
    # cancellation). Its total 0.0095 is the TRUE #2 result; dropping it
    # would violate the exactness contract.
    cand = FlatCandidates(
        rows=np.array([5], np.int32),
        cols=np.array([0], np.int32),
        tail=np.array([0.0005], np.float32),
        ptr=np.array([0, 1], np.int64),
        total=1,
    )
    cand_head = np.array([0.009], np.float32)
    s, r = merge_host(
        head_scores, head_rows, cand, cand_head, 10, k,
        use_native=use_native,
        tau_slack=np.array([0.05], np.float32),
    )
    assert 5 in r[0].tolist() and np.isclose(s[0, 1], 0.0095), (s, r)
    # Zero slack + the same tiny margins: the prefilter applies at face
    # value and drops the candidate's total (documents the knob's sharp
    # edge; backends differ in whether the masked head row id lingers
    # with a -inf score, so assert on the score).
    s0, r0 = merge_host(
        head_scores, head_rows, cand, cand_head, 10, k,
        use_native=use_native,
        tau_slack=np.array([0.0], np.float32),
    )
    assert not np.isclose(s0[0], 0.0095).any(), (s0, r0)
    # None = prefilter disabled entirely -> exact merge keeps it.
    s1, r1 = merge_host(
        head_scores, head_rows, cand, cand_head, 10, k,
        use_native=use_native, tau_slack=None,
    )
    assert 5 in r1[0].tolist() and np.isclose(s1[0, 1], 0.0095)


def test_merge_tau_slack_segment_sums():
    slack_per_term = np.array([0.5, 0.0, 2.0], np.float32)
    ids = np.array([0, 2, 1, 0], np.int32)
    counts = np.array([2.0, 1.0, 3.0, -1.0], np.float32)
    ptr = np.array([0, 2, 2, 4], np.int64)  # q1 has no head terms
    got = merge_tau_slack(slack_per_term, ids, counts, ptr)
    np.testing.assert_allclose(got, [2 * 0.5 + 2.0, 0.0, 0.0 + 0.5])


@pytest.mark.parametrize("use_native", BACKENDS)
def test_merge_prefilter_with_slack_stays_exact(use_native):
    """Randomized: prefiltered merge with a generous slack == unfiltered
    exact merge, including padded-batch tau_slack (fewer slack entries
    than head rows)."""
    rng = np.random.RandomState(11)
    n_rows, b, k = 60, 5, 6
    full_head, tail, cand, cand_head, head_s, head_r = _build_case(
        rng, n_rows, b, k
    )
    slack = np.full(b - 2, 0.05, np.float32)  # shorter than b: pad path
    got_s, got_r = merge_host(
        head_s, head_r, cand, cand_head, n_rows, k,
        use_native=use_native, tau_slack=slack,
    )
    ref_s, ref_r = merge_host(
        head_s, head_r, cand, cand_head, n_rows, k,
        use_native=use_native, tau_slack=None,
    )
    np.testing.assert_allclose(got_s, ref_s, rtol=1e-6, atol=1e-7)
