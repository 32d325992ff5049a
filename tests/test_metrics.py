import math

import pytest

from osr_tpu.metrics.generation import (
    bleu,
    evaluate_generation,
    faithfulness,
    rouge_l,
    rouge_n,
)
from osr_tpu.metrics.ir import (
    evaluate_retrieval,
    map_at_k,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
)


def test_ndcg_hand_computed():
    results = {"q1": {"d1": 3.0, "d2": 2.0, "d3": 1.0}}
    qrels = {"q1": {"d1": 1, "d3": 2}}
    # Linear gains (trec_eval ndcg_cut):
    # DCG = 1/log2(2) + 0 + 2/log2(4) = 1 + 1 = 2
    # IDCG = 2/log2(2) + 1/log2(3)
    idcg = 2 + 1 / math.log2(3)
    assert ndcg_at_k(results, qrels, 10) == pytest.approx(2.0 / idcg)


def test_ndcg_tie_break_desc_doc_id():
    # Tied scores: trec_eval keeps the LARGER doc id first.
    results = {"q1": {"a": 1.0, "b": 1.0}}
    assert ndcg_at_k(results, {"q1": {"b": 1}}, 1) == pytest.approx(1.0)
    assert ndcg_at_k(results, {"q1": {"a": 1}}, 1) == pytest.approx(0.0)


def test_zero_relevant_query_dropped_everywhere():
    results = {"q1": {"d1": 1.0}, "q2": {"d1": 1.0}}
    qrels = {"q1": {"d1": 1}, "q2": {"dX": 0}}  # q2 has no positive judgment
    assert ndcg_at_k(results, qrels, 10) == pytest.approx(1.0)
    assert map_at_k(results, qrels, 10) == pytest.approx(1.0)
    assert precision_at_k(results, qrels, 1) == pytest.approx(1.0)
    assert recall_at_k(results, qrels, 10) == pytest.approx(1.0)


def test_map_normalized_by_total_relevant():
    # 3 relevant total, only 1 retrievable in top-k: AP = (1/1) / 3.
    results = {"q1": {"d1": 1.0}}
    qrels = {"q1": {"d1": 1, "d2": 1, "d3": 1}}
    assert map_at_k(results, qrels, 10) == pytest.approx(1 / 3)


def test_map_recall_precision():
    results = {"q1": {"d1": 3.0, "d2": 2.0, "d3": 1.0, "d4": 0.5}}
    qrels = {"q1": {"d1": 1, "d3": 1, "d9": 1}}
    # hits at ranks 1 and 3: AP = (1/1 + 2/3) / min(3, k)
    assert map_at_k(results, qrels, 10) == pytest.approx((1 + 2 / 3) / 3)
    assert recall_at_k(results, qrels, 10) == pytest.approx(2 / 3)
    assert precision_at_k(results, qrels, 2) == pytest.approx(1 / 2)
    assert recall_at_k(results, qrels, 1) == pytest.approx(1 / 3)


def test_evaluate_retrieval_keys():
    results = {"q1": {"d1": 1.0}}
    qrels = {"q1": {"d1": 1}}
    m = evaluate_retrieval(results, qrels, k_values=(10, 100))
    assert set(m) == {
        "ndcg@10", "map@10", "recall@10", "p@10",
        "ndcg@100", "map@100", "recall@100", "p@100",
    }
    assert m["ndcg@10"] == pytest.approx(1.0)
    assert m["recall@10"] == pytest.approx(1.0)


def test_query_missing_from_results_skipped():
    results = {}
    qrels = {"q1": {"d1": 1}}
    assert ndcg_at_k(results, qrels, 10) == 0.0


def test_rouge_l():
    r = rouge_l("the cat sat", "the cat sat")
    assert r["f1"] == pytest.approx(1.0)
    r = rouge_l("a b c d", "a x c y")  # LCS = a c = 2
    assert r["precision"] == pytest.approx(0.5)
    assert r["recall"] == pytest.approx(0.5)
    assert rouge_l("", "")["f1"] == 1.0
    assert rouge_l("x", "")["f1"] == 0.0


def test_rouge_l_punctuation_normalized():
    assert rouge_l("The CAT, sat!", "the cat sat")["f1"] == pytest.approx(1.0)


def test_rouge_n():
    r1 = rouge_n("a b c", "a b d", n=1)
    assert r1["precision"] == pytest.approx(2 / 3)
    r2 = rouge_n("a b c", "a b d", n=2)  # bigrams: {ab, bc} vs {ab, bd}
    assert r2["precision"] == pytest.approx(1 / 2)


def test_bleu():
    assert bleu("the cat sat on the mat", "the cat sat on the mat") == pytest.approx(1.0)
    assert bleu("completely different words here", "the cat sat") == 0.0
    # brevity penalty: shorter prediction penalized
    assert bleu("the cat", "the cat sat on the mat") < 1.0


def test_faithfulness():
    f = faithfulness("the cat sat", ["the cat sat on a mat", "dogs bark"])
    assert f["faithfulness_score"] == pytest.approx(1.0)
    assert f["supporting_contexts"] == 1
    f2 = faithfulness("unrelated answer", ["the cat sat"])
    assert f2["faithfulness_score"] == 0.0


def test_evaluate_generation():
    preds = [
        {
            "qid": "q1",
            "answer": "the cat sat",
            "contexts": [{"docid": "d1", "text": "the cat sat on a mat"}],
        },
        {"qid": "q2", "answer": "no ref for me"},
    ]
    refs = {"q1": "the cat sat"}
    out = evaluate_generation(preds, refs)
    assert out["evaluated_predictions"] == 1
    assert out["missing_references"] == 1
    assert out["rouge_l"] == pytest.approx(1.0)
    assert out["bleu"] == pytest.approx(1.0)
    assert evaluate_generation([], refs)["error"]
    assert evaluate_generation(preds, {})["error"]
