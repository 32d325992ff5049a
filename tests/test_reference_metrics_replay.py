"""Replay the reference's committed FiQA raw results through metrics/ir.py.

The reference repo ships the full per-query ranked lists of its
``bm25_custom`` BEIR run (reference bench/results/fiqa_bm25_custom_
results.json: 648 queries x top-100 scored documents) plus the summary the
BEIR ``EvaluateRetrieval`` computed from them (nDCG@10 = 0.1591, ...).

The FiQA qrels are NOT in the snapshot (the datasets directory was
stripped; see /root/reference/.MISSING_LARGE_BLOBS), so the exact 0.1591
cannot be recomputed offline. What CAN be hardened without network — and
is, here — is our trec_eval-semantics implementation on the reference's
REAL ranked lists: for constructed qrels over those lists, every metric in
osr_tpu/metrics/ir.py must agree with an independent brute-force
implementation written from the trec_eval definitions, and the summary's
internal consistency (latency arithmetic, metric orderings) must hold.
"""

import json
import math
from pathlib import Path

import numpy as np
import pytest

from osr_tpu.metrics.ir import (
    evaluate_retrieval,
    map_at_k,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
)

RAW = Path("/root/reference/bench/results/fiqa_bm25_custom_results.json")
SUMMARY = Path("/root/reference/bench/results/fiqa_bm25_custom_summary.json")

pytestmark = pytest.mark.skipif(
    not RAW.exists(), reason="reference results not mounted"
)


@pytest.fixture(scope="module")
def raw_results():
    with open(RAW) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def summary():
    with open(SUMMARY) as f:
        return json.load(f)


def test_committed_results_shape(raw_results, summary):
    assert len(raw_results) == summary["n_queries"] == 648
    lens = [len(v) for v in raw_results.values()]
    assert max(lens) <= 100  # top_k=100 run
    # scores are descending-sortable floats
    some = next(iter(raw_results.values()))
    vals = list(some.values())
    assert all(isinstance(v, float) for v in vals)


def test_summary_internal_consistency(summary):
    assert summary["avg_latency_s"] == pytest.approx(
        summary["total_time_s"] / summary["n_queries"], rel=1e-3
    )
    # trec_eval identities on any run: metrics grow with depth.
    assert summary["nDCG@100"] >= summary["nDCG@10"]
    assert summary["MAP@100"] >= summary["MAP@10"]
    assert summary["Recall@100"] >= summary["Recall@10"]


# -- independent brute-force implementations (trec_eval definitions) ------


def _brute_ndcg(results, qrels, k):
    vals = []
    for qid, rels in qrels.items():
        if not any(r > 0 for r in rels.values()):
            continue
        ranked = sorted(
            results.get(qid, {}).items(),
            key=lambda kv: (kv[1], kv[0]),
            reverse=True,  # trec_eval tie order: score desc, doc id desc
        )[:k]
        # trec_eval / pytrec_eval ndcg_cut uses LINEAR gain.
        dcg = sum(
            rels.get(d, 0) / math.log2(i + 2)
            for i, (d, _) in enumerate(ranked)
        )
        ideal = sorted((r for r in rels.values() if r > 0), reverse=True)[:k]
        idcg = sum(r / math.log2(i + 2) for i, r in enumerate(ideal))
        vals.append(dcg / idcg if idcg else 0.0)
    return float(np.mean(vals)) if vals else 0.0


def _brute_map(results, qrels, k):
    vals = []
    for qid, rels in qrels.items():
        relevant = {d for d, r in rels.items() if r > 0}
        if not relevant:
            continue
        ranked = sorted(
            results.get(qid, {}).items(),
            key=lambda kv: (kv[1], kv[0]),
            reverse=True,  # trec_eval tie order: score desc, doc id desc
        )[:k]
        hits, ap = 0, 0.0
        for i, (d, _) in enumerate(ranked):
            if d in relevant:
                hits += 1
                ap += hits / (i + 1)
        # trec_eval map_cut divides by the TOTAL relevant count.
        vals.append(ap / len(relevant))
    return float(np.mean(vals)) if vals else 0.0


def _brute_recall(results, qrels, k):
    vals = []
    for qid, rels in qrels.items():
        relevant = {d for d, r in rels.items() if r > 0}
        if not relevant:
            continue
        ranked = sorted(
            results.get(qid, {}).items(),
            key=lambda kv: (kv[1], kv[0]),
            reverse=True,  # trec_eval tie order: score desc, doc id desc
        )[:k]
        vals.append(len({d for d, _ in ranked} & relevant) / len(relevant))
    return float(np.mean(vals)) if vals else 0.0


def _brute_precision(results, qrels, k):
    vals = []
    for qid, rels in qrels.items():
        relevant = {d for d, r in rels.items() if r > 0}
        if not relevant:
            continue
        ranked = sorted(
            results.get(qid, {}).items(),
            key=lambda kv: (kv[1], kv[0]),
            reverse=True,  # trec_eval tie order: score desc, doc id desc
        )[:k]
        vals.append(len({d for d, _ in ranked} & relevant) / k)
    return float(np.mean(vals)) if vals else 0.0


def _constructed_qrels(raw_results, seed=13):
    """Deterministic graded qrels over the committed ranked lists: a mix of
    retrieved docs at assorted ranks (graded 1/2) and unretrieved doc ids
    (misses), so every metric exercises hits, misses and grading."""
    rng = np.random.RandomState(seed)
    qrels = {}
    for qid, scores in raw_results.items():
        ranked = sorted(scores, key=lambda d: -scores[d])
        rels = {}
        if ranked:
            picks = rng.choice(
                len(ranked), size=min(4, len(ranked)), replace=False
            )
            for j, p in enumerate(picks):
                rels[ranked[p]] = 1 + (j % 2)
        rels[f"missing_{qid}"] = 1  # never retrieved
        if rng.rand() < 0.05:
            rels = {f"missing_{qid}": 1}  # all-miss query
        qrels[qid] = rels
    return qrels


@pytest.mark.parametrize("k", [10, 100])
def test_ir_metrics_match_bruteforce_on_committed_lists(raw_results, k):
    qrels = _constructed_qrels(raw_results)
    assert ndcg_at_k(raw_results, qrels, k) == pytest.approx(
        _brute_ndcg(raw_results, qrels, k), abs=1e-9
    )
    assert map_at_k(raw_results, qrels, k) == pytest.approx(
        _brute_map(raw_results, qrels, k), abs=1e-9
    )
    assert recall_at_k(raw_results, qrels, k) == pytest.approx(
        _brute_recall(raw_results, qrels, k), abs=1e-9
    )
    assert precision_at_k(raw_results, qrels, k) == pytest.approx(
        _brute_precision(raw_results, qrels, k), abs=1e-9
    )


def test_evaluate_retrieval_summary_keys(raw_results):
    qrels = _constructed_qrels(raw_results)
    out = evaluate_retrieval(raw_results, qrels, k_values=(10, 100))
    for key in ("ndcg@10", "ndcg@100", "map@10", "recall@100", "p@10"):
        assert key in out
        assert 0.0 <= out[key] <= 1.0
