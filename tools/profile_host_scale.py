#!/usr/bin/env python3
"""Host-stage decomposition + tail-pruning potential at corpus scale.

The 10M-docs-one-chip row is host-tail-capped (VERDICT r4 #4:
62.3 QPS, ~16 ms/query of postings work at max_tail_df 93,310). This
tool loads a saved index dump (tools/bench_scaling.py --save-index),
runs ONLY the host stages over synthetic queries (no TPU needed), and
reports:

1. Per-stage wall time: encode, tail walk (tail_candidates_flat),
   candidate head-dot (cand_head_scores_host), merge — plus the one-time
   prepare_host_merge (int4 unpack + term-major transpose) cost.
2. Pruning-potential analysis for a MaxScore-style TERM-LEVEL skip:
   per query, estimate theta = tau_final - tau0 (the budget a doc
   outside the head top-k must clear from tail contributions alone) and
   report how many postings live in tail terms whose per-term upper
   bound U_t = max_weight(t) * qtf falls inside a skippable suffix
   (sum of skipped U_t < theta). This is the exactness condition of
   the classic MaxScore non-essential-list split (term-at-a-time
   variant); the 1M-doc candidate-level pruning experiments were
   measured and rejected (DEVELOPMENT.md), but TERM-level skip attacks
   the walk itself, which only matters once max_tail_df is ~1e5.

The tau0/tau_final estimates here are candidate-restricted (no device):
tau0_est = k-th largest candidate HEAD score (<= true tau0, which
overestimates theta), tau_final_est = k-th largest candidate TOTAL
(<= true tau_final, which underestimates theta). Both biases are
reported; the real decision measurement reruns on the TPU.

Usage:
  python tools/profile_host_scale.py --load-index .scaling_dumps/d10m_f2048
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_dump(d: Path):
    from osr_tpu.index.builder import SparseIndex
    from osr_tpu.index.layout import HybridLayout

    meta = json.loads((d / "meta.json").read_text())
    terms = json.loads((d / "vocab.json").read_text())
    ld = lambda n: np.load(d / f"{n}.npy", allow_pickle=False)
    layout = HybridLayout(
        head_terms=meta["head_terms"],
        head=ld("head"),
        head_scales=(
            ld("head_scales")
            if meta["head_dtype"] in ("int8", "int4")
            else None
        ),
        post_ptr=ld("post_ptr"),
        post_rows=ld("post_rows"),
        post_weights=ld("post_weights"),
        valid=ld("valid"),
        num_docs=meta["num_docs"],
        vocab_size=meta["vocab_size"],
        head_dtype=meta["head_dtype"],
    )
    return SparseIndex(
        method="bm25",
        vocabulary={t: i for i, t in enumerate(terms)},
        doc_ids=[str(i) for i in range(meta["num_docs"])],
        layout=layout,
        idf=ld("idf"),
        doc_lengths=ld("doc_lengths"),
        avgdl=meta["avgdl"],
        k1=1.2,
        b=0.75,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load-index", required=True)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--topk", type=int, default=50)
    args = ap.parse_args()

    from osr_tpu.index.postings import (
        cand_head_scores_host,
        merge_host,
        merge_tau_slack,
        prepare_host_merge,
        tail_candidates_flat,
    )
    from osr_tpu.index.tokenizer import Tokenizer
    from osr_tpu.retrieval.encoding import QueryEncoder, encode_query_batch
    from osr_tpu.testing import SyntheticDataGenerator

    t0 = time.perf_counter()
    index = load_dump(Path(args.load_index))
    lay = index.layout
    print(
        f"# loaded {lay.num_docs} docs F={lay.head_terms} "
        f"({lay.head_dtype}) tail_nnz={lay.tail_nnz} "
        f"max_tail_df={lay.max_tail_df} in {time.perf_counter()-t0:.1f}s",
        file=sys.stderr,
    )

    gen = SyntheticDataGenerator(seed=42)
    queries = list(
        gen.queries(
            args.queries, lay.vocab_size, avg_terms=11, word_prefix="t",
            min_terms=2,
        ).values()
    )

    t0 = time.perf_counter()
    host_head, host_head_dtype, head_t, slack_per_term = prepare_host_merge(
        lay, want_head_t=True
    )
    prep_s = time.perf_counter() - t0
    print(f"# prepare_host_merge: {prep_s:.1f}s", file=sys.stderr)

    enc_obj = QueryEncoder(Tokenizer(index.vocabulary))
    nq = len(queries)
    t0 = time.perf_counter()
    enc = encode_query_batch(enc_obj, queries, nq, lay.head_terms)
    encode_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    cand = tail_candidates_flat(
        lay.post_ptr, lay.post_rows, lay.post_weights,
        enc.tail_ids, enc.tail_counts, enc.tail_ptr,
        nq, num_rows=lay.num_rows, pad_to_menu=False,
    )
    walk_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    cand_head = cand_head_scores_host(
        host_head, host_head_dtype, lay.head_scales, cand,
        enc.head_flat_ids, enc.head_flat_counts, enc.head_ptr,
        head_t=head_t,
    )
    cand_head_s = time.perf_counter() - t0

    # Pseudo head top-k (candidate-restricted): enough for merge timing
    # and theta estimation; biases documented in the module docstring.
    k = args.topk
    total = cand.total
    cols = cand.cols[:total]
    head_s_pad = np.full((nq, k), -np.inf, dtype=np.float32)
    head_r_pad = np.zeros((nq, k), dtype=np.int32)
    totals = cand_head[:total] + cand.tail[:total]
    tau_final_est = np.full(nq, -np.inf, dtype=np.float32)
    for q in range(nq):
        lo, hi = int(cand.ptr[q]), int(cand.ptr[q + 1])
        if hi == lo:
            continue
        ch = cand_head[lo:hi]
        kk = min(k, hi - lo)
        sel = np.argpartition(-ch, kk - 1)[:kk]
        order = np.argsort(-ch[sel])
        head_s_pad[q, :kk] = ch[sel][order]
        head_r_pad[q, :kk] = cand.rows[lo:hi][sel][order]
        tt = totals[lo:hi]
        tau_final_est[q] = np.partition(-tt, kk - 1)[kk - 1] * -1.0

    t0 = time.perf_counter()
    tau_slack = merge_tau_slack(
        slack_per_term, enc.head_flat_ids, enc.head_flat_counts,
        enc.head_ptr,
    )
    merge_host(
        head_s_pad, head_r_pad, cand, cand_head, lay.num_rows, k,
        tau_slack=tau_slack,
    )
    merge_s = time.perf_counter() - t0

    postings_per_q = (
        np.diff(lay.post_ptr)[enc.tail_ids].astype(np.float64)
    )
    seg = np.add.reduceat(
        postings_per_q, enc.tail_ptr[:-1].astype(np.int64)
    ) if len(enc.tail_ids) else np.zeros(nq)

    # --- term-level skip potential (MaxScore split) ---
    t0 = time.perf_counter()
    df = np.diff(lay.post_ptr)
    m_t = np.zeros(len(df), dtype=np.float32)
    nzt = df > 0
    if nzt.any():
        m_t[nzt] = np.maximum.reduceat(
            lay.post_weights, lay.post_ptr[:-1][nzt].astype(np.int64)
        )
    tau0_est = head_s_pad[:, k - 1]
    with np.errstate(invalid="ignore"):
        theta = tau_final_est - tau0_est - tau_slack[:nq]
    finite_theta = theta[np.isfinite(theta)]
    if len(finite_theta) == 0:
        finite_theta = np.zeros(1, dtype=np.float32)
    saved = np.zeros(nq, dtype=np.float64)
    walked = np.zeros(nq, dtype=np.float64)
    for q in range(nq):
        lo, hi = int(enc.tail_ptr[q]), int(enc.tail_ptr[q + 1])
        tids = enc.tail_ids[lo:hi]
        u = m_t[tids] * enc.tail_counts[lo:hi]
        dfs = df[tids].astype(np.float64)
        walked[q] = dfs.sum()
        if not np.isfinite(theta[q]) or theta[q] <= 0:
            continue
        order = np.argsort(u)  # ascending: cheapest bounds first
        csum = np.cumsum(u[order])
        n_skip = int(np.searchsorted(csum, theta[q], side="left"))
        saved[q] = dfs[order][:n_skip].sum()
    analysis_s = time.perf_counter() - t0

    out = {
        "num_docs": lay.num_docs,
        "head_terms": lay.head_terms,
        "head_dtype": lay.head_dtype,
        "max_tail_df": lay.max_tail_df,
        "num_queries": nq,
        "prepare_host_merge_s": round(prep_s, 2),
        "encode_ms_per_q": round(1000 * encode_s / nq, 3),
        "walk_ms_per_q": round(1000 * walk_s / nq, 3),
        "cand_head_ms_per_q": round(1000 * cand_head_s / nq, 3),
        "merge_ms_per_q": round(1000 * merge_s / nq, 3),
        "host_total_ms_per_q": round(
            1000 * (encode_s + walk_s + cand_head_s + merge_s) / nq, 3
        ),
        "postings_per_q_mean": round(float(seg.mean()), 1),
        "candidates_per_q_mean": round(total / nq, 1),
        "cand_head_ns_per_gather": round(
            1e9
            * cand_head_s
            / max(1, total * max(1.0, np.diff(enc.head_ptr).mean())),
            2,
        ),
        "theta_median": round(float(np.median(finite_theta)), 3),
        "theta_p10": round(float(np.percentile(finite_theta, 10)), 3),
        "theta_finite_frac": round(float(np.isfinite(theta).mean()), 3),
        "skip_fraction_of_postings": round(
            float(saved.sum() / max(walked.sum(), 1)), 4
        ),
        # Candidate tail-filter selectivity (exact post-walk filter): a doc
        # outside the device head top-k needs tail >= theta to enter the
        # final top-k, so candidates below the per-query theta skip the
        # head-dot + merge entirely. Reported: fraction RETAINED.
        "cand_tail_ge_theta_frac": round(
            float(
                np.mean(
                    [
                        (
                            cand.tail[
                                int(cand.ptr[q]) : int(cand.ptr[q + 1])
                            ]
                            >= theta[q]
                        ).mean()
                        if np.isfinite(theta[q])
                        and cand.ptr[q + 1] > cand.ptr[q]
                        else 1.0
                        for q in range(nq)
                    ]
                )
            ),
            4,
        ),
        "postings_per_q_after_skip": round(
            float((walked - saved).mean()), 1
        ),
        "analysis_s": round(analysis_s, 2),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
