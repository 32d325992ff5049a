"""Benchmark framework + suites tests (small sizes)."""

import json

import pytest

from osr_tpu.benchmarks.framework import (
    BenchmarkResult,
    grade_performance,
    format_results_table,
    generate_report,
    measure_size,
)
from osr_tpu.benchmarks.integration import IntegrationRunner
from osr_tpu.testing import (
    CorrectnessValidator,
    SyntheticDataGenerator,
    spearman_correlation,
)

import numpy as np


def test_grading():
    assert grade_performance(2.5, 1.0) == "A+"
    assert grade_performance(1.0, 1.0) == "C"
    assert grade_performance(0.6, 1.0) == "D"
    assert grade_performance(0.1, 1.0) == "F"
    assert grade_performance(5.0, 0.0) == "A+"


def test_measure_size():
    a = np.zeros((10, 10), np.float32)
    assert measure_size(a) == 400
    assert measure_size([a, a]) > 800
    assert measure_size({"x": a}) > 400


def test_report_generation(tmp_path):
    outputs = [
        {
            "suite": "demo",
            "duration_s": 0.1,
            "num_benchmarks": 1,
            "num_passed": 1,
            "all_passed": True,
            "error": None,
            "results": [
                BenchmarkResult(
                    "case", True, 0.1, {"metric": 1.0}, grade="A"
                ).to_dict()
            ],
        }
    ]
    report = generate_report(outputs, tmp_path / "r.md")
    assert "demo" in report and "PASS" in report and "grade A" in report
    assert (tmp_path / "r.md").exists()
    table = format_results_table([{"a": 1, "b": 0.5}], ["a", "b"])
    assert "| 1 | 0.5000 |" in table


def test_spearman():
    assert spearman_correlation([1, 2, 3], [10, 20, 30]) == pytest.approx(1.0)
    assert spearman_correlation([1, 2, 3], [30, 20, 10]) == pytest.approx(-1.0)
    assert spearman_correlation([1.0], [2.0]) == 1.0


def test_validators():
    v = CorrectnessValidator.validate_scores(
        np.array([1.0, 2.0]), np.array([1.0, 2.0005])
    )
    assert v["passed"]
    v = CorrectnessValidator.validate_scores(
        np.array([1.0, 5.0]), np.array([1.0, 2.0])
    )
    assert not v["passed"]
    r = CorrectnessValidator.validate_topk_ranking([1, 2, 3], [1, 2, 4])
    assert r["precision_at_k"] == pytest.approx(2 / 3)
    assert r["rank_spearman"] == pytest.approx(1.0)
    # reversed common ordering -> negative rank correlation
    r2 = CorrectnessValidator.validate_topk_ranking(
        [3, 2, 1], [1, 2, 3], min_overlap=0.5
    )
    assert r2["rank_spearman"] == pytest.approx(-1.0)


def test_synthetic_generator_deterministic():
    g1 = SyntheticDataGenerator(seed=42)
    g2 = SyntheticDataGenerator(seed=42)
    assert g1.zipf_corpus(5, 50) == g2.zipf_corpus(5, 50)
    assert g1.queries(3, 50) == g2.queries(3, 50)
    np.testing.assert_array_equal(g1.embeddings(4, 16), g2.embeddings(4, 16))


def test_integration_runner_small(tmp_path):
    runner = IntegrationRunner(
        out_dir=tmp_path,
        suites=["bm25", "topk", "quantization", "storage"],
        suite_kwargs={
            "bm25": {"num_docs": 120, "vocab_size": 400},
            "topk": {"n": 4000, "batch": 4, "k": 20},
            "quantization": {"num_docs": 300, "dim": 64},
            "storage": {"num_docs": 200},
        },
    )
    overall = runner.run()
    assert overall["all_passed"], json.dumps(overall, default=str)[:2000]
    assert (tmp_path / "integration_report.md").exists()
    assert (tmp_path / "bm25_results.json").exists()


def test_quality_benchmark(tmp_path):
    from osr_tpu.benchmarks.quality import run_quality_benchmark

    gen = SyntheticDataGenerator()
    corpus = gen.zipf_corpus(60, 300, avg_len=30)
    ds = tmp_path / "ds"
    ds.mkdir()
    with open(ds / "corpus.jsonl", "w") as f:
        for d, rec in corpus.items():
            f.write(json.dumps({"_id": d, **rec}) + "\n")
    with open(ds / "queries.jsonl", "w") as f:
        for i in range(8):
            words = corpus[f"doc{i}"]["text"].split()
            rare = sorted(set(words), key=lambda w: -int(w[4:]))[:3]
            f.write(json.dumps({"_id": f"q{i}", "text": " ".join(rare)}) + "\n")
    (ds / "qrels").mkdir()
    with open(ds / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for i in range(8):
            f.write(f"q{i}\tdoc{i}\t1\n")

    results = run_quality_benchmark(
        ds, methods=("bm25", "tfidf"), out_dir=tmp_path / "out", top_k=10
    )
    assert "error" not in results["bm25"]
    assert results["bm25"]["ndcg@10"] > 0.5  # rare-term queries hit their doc
    assert (tmp_path / "out" / "ds_quality_report.md").exists()
    assert (tmp_path / "out" / "ds_quality_results.csv").exists()


def test_yaml_config_runner(tmp_path):
    import yaml

    from osr_tpu.benchmarks.integration import load_benchmark_config, main

    cfg = {
        "out_dir": str(tmp_path / "out"),
        "seed": 7,
        "suites": {"storage": {"num_docs": 50}},
    }
    p = tmp_path / "bench.yaml"
    p.write_text(yaml.safe_dump(cfg))
    loaded = load_benchmark_config(p)
    assert loaded["suites"] == {"storage": {"num_docs": 50}}
    assert main(["--config", str(p)]) == 0
    assert (tmp_path / "out" / "integration_report.md").exists()

    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.safe_dump({"suites": {"nope": {}}}))
    with pytest.raises(ValueError):
        load_benchmark_config(bad)


def test_yaml_benchmark_runner(tmp_path):
    """python -m osr_tpu.cli bench --config reproduces the test_results
    tree from a YAML spec (reference bench/core/benchmark_runner.py)."""
    import yaml

    from osr_tpu.benchmarks.runner import (
        BenchmarkConfig,
        load_benchmark_config,
        run_from_config,
    )

    cfg_path = tmp_path / "spec.yaml"
    cfg_path.write_text(
        yaml.safe_dump(
            {
                "name": "tiny",
                "seed": 7,
                "num_threads": 1,
                "output_dir": str(tmp_path / "out"),
                "suites": {
                    "topk": {"n": 2000, "batch": 4, "k": 20},
                    "quantization": {},
                },
            }
        )
    )
    cfg = load_benchmark_config(cfg_path)
    assert isinstance(cfg, BenchmarkConfig)
    overall = run_from_config(cfg)
    assert overall["all_passed"], overall
    assert (tmp_path / "out" / "topk_results.json").exists()
    assert (tmp_path / "out" / "quantization_results.json").exists()
    assert overall["config"]["seed"] == 7

    # unknown suite / key rejected
    bad = tmp_path / "bad.yaml"
    bad.write_text("suites: {nope: {}}\n")
    with pytest.raises(ValueError, match="Unknown benchmark suites"):
        load_benchmark_config(bad)
    bad.write_text("bogus_key: 1\n")
    with pytest.raises(ValueError, match="Unknown benchmark config keys"):
        load_benchmark_config(bad)


def test_cli_bench_config(tmp_path):
    import yaml

    from osr_tpu.cli import main

    cfg_path = tmp_path / "spec.yaml"
    cfg_path.write_text(
        yaml.safe_dump(
            {
                "suites": {"topk": {"n": 1000, "batch": 2, "k": 10}},
                "output_dir": str(tmp_path / "res"),
            }
        )
    )
    rc = main(["bench", "--config", str(cfg_path)])
    assert rc == 0
    assert (tmp_path / "res" / "topk_results.json").exists()


def test_beir_compatible_search_adapter(tmp_path):
    """BEIRCompatibleSearch duck-types beir's BaseSearch: search(corpus,
    queries, top_k) -> {qid: {doc_id: score}} with REAL ranking, plus the
    mmap store for document fetch."""
    from tests.reference_impl import DenseOracleScorer, zipf_corpus

    from osr_tpu.benchmarks.beir_adapter import BEIRCompatibleSearch

    corpus_raw = zipf_corpus(num_docs=120, vocab_size=400, avg_len=40)
    corpus = {
        d: {"text": rec["text"], "title": ""} for d, rec in corpus_raw.items()
    }
    queries = {"q1": "term200 term340", "q2": "term150"}
    s = BEIRCompatibleSearch(
        method="bm25", store_path=tmp_path / "c.osrd", cache_queries=False
    )
    try:
        results = s.search(corpus, queries, top_k=5)
        assert set(results) == {"q1", "q2"}
        oracle = DenseOracleScorer(corpus_raw, method="bm25")
        want_idx, want_scores = oracle.topk("term200 term340", 5)
        want = {
            oracle.doc_ids[i] for i, sc in zip(want_idx, want_scores) if sc > 0
        }
        assert set(results["q1"]) == want
        # store fetch joins text back
        docs = s.get_documents(list(results["q1"])[:2])
        assert all(d is not None and d.text for d in docs)
        assert s.index_stats["num_docs"] == 120
    finally:
        s.close()


def test_storage_suite_real_text():
    """Component #32's realistic-text fixture: the storage suite runs on
    real English prose (reference markdown, offline) where zlib actually
    compresses (>1.2x), unlike the reference's synthetic data (0.993x,
    reference test_results/memory_mapping_results.json)."""
    from osr_tpu.benchmarks.suites import StorageSuite, real_prose_paragraphs

    if not real_prose_paragraphs():
        import pytest

        pytest.skip("reference prose not mounted")
    s = StorageSuite(num_docs=300, text_source="real")
    s.setup()
    try:
        results = s.run()
    finally:
        s.cleanup()
    by_name = {r.name: r for r in results}
    assert all(r.passed for r in results)
    assert by_name["build"].metrics["compression_ratio"] > 1.2
