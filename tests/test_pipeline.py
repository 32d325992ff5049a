"""End-to-end pipeline tests: dataset on disk -> experiments -> outputs.

The equivalent of the reference's smoke test (reference
rag_system/test_pipeline.py) plus coverage for the orchestrator, ablation
driver, error analysis and the CLI.
"""

import json

import pytest
import yaml

from tests.reference_impl import zipf_corpus, zipf_queries


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    """A BEIR-format synthetic dataset with self-consistent qrels: query qN
    is drawn from doc dN's rare terms, so dN is its relevant doc."""
    root = tmp_path_factory.mktemp("datasets")
    ds = root / "synth"
    ds.mkdir()
    corpus = zipf_corpus(num_docs=80, vocab_size=400, avg_len=40)
    with open(ds / "corpus.jsonl", "w") as f:
        for doc_id, doc in corpus.items():
            f.write(
                json.dumps({"_id": doc_id, "text": doc["text"], "title": doc["title"]})
                + "\n"
            )
    # Queries: the 3 rarest terms of each of the first 12 docs.
    with open(ds / "queries.jsonl", "w") as f:
        for i in range(12):
            words = corpus[f"doc{i}"]["text"].split()
            rare = sorted(set(words), key=lambda w: -int(w[4:]))[:3]
            f.write(json.dumps({"_id": f"q{i}", "text": " ".join(rare)}) + "\n")
    (ds / "qrels").mkdir()
    with open(ds / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for i in range(12):
            f.write(f"q{i}\tdoc{i}\t1\n")
    return root


@pytest.fixture(scope="module")
def config_file(dataset_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("results")
    cfg = {
        "output_dir": str(out),
        "datasets_root": str(dataset_dir),
        "experiments": [
            {
                "name": "synth_bm25",
                "dataset": "synth",
                "retriever": {
                    "type": "bm25",
                    "params": {"top_k": 10, "cache_matrices": False},
                },
                "reader": {"type": "extractive", "params": {"max_answer_length": 100}},
            },
            {
                "name": "synth_dense",
                "dataset": "synth",
                "retriever": {
                    "type": "dpr",
                    "params": {"top_k": 10, "embedding_dim": 32},
                },
                "reader": {"type": "generative", "params": {}},
            },
        ],
    }
    path = tmp_path_factory.mktemp("cfg") / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return path, out


def test_run_all_experiments(config_file):
    from osr_tpu.pipeline.config import load_config
    from osr_tpu.pipeline.experiment import run_all_experiments

    path, out = config_file
    cfg = load_config(str(path))
    overall = run_all_experiments(cfg)
    assert overall["synth_bm25"]["status"] == "ok"
    assert overall["synth_dense"]["status"] == "ok"
    # BM25 retrieval quality: each query targets its source doc's rare
    # terms, so recall@10 must be high.
    q = overall["synth_bm25"]["quality"]
    assert q["recall@10"] >= 0.9
    assert q["ndcg@10"] > 0.5
    # Artifacts on disk.
    assert (out / "overall_results.json").exists()
    preds = json.loads((out / "synth_bm25_preds.json").read_text())
    assert len(preds) == 12
    assert all(p["answer"] for p in preds)
    summary = json.loads((out / "synth_bm25_summary.json").read_text())
    assert summary["queries_processed"] == 12
    assert summary["queries_per_second"] > 0


def test_config_validation(tmp_path):
    from osr_tpu.pipeline.config import ConfigError, load_config, validate_config

    with pytest.raises(ConfigError):
        validate_config({"experiments": []})
    with pytest.raises(ConfigError):
        validate_config({"experiments": [{"name": "x"}]})
    p = tmp_path / "bad.yaml"
    p.write_text("output_dir: x\n")
    with pytest.raises(ConfigError):
        load_config(p)
    with pytest.raises(FileNotFoundError):
        load_config(tmp_path / "missing.yaml")


def test_ablation(dataset_dir, tmp_path):
    from osr_tpu.pipeline.ablation import (
        deep_update,
        generate_ablation_configs,
        run_ablation,
    )

    assert deep_update({"a": {"b": 1, "c": 2}}, {"a": {"b": 9}}) == {
        "a": {"b": 9, "c": 2}
    }

    base = {
        "name": "synth_bm25",
        "dataset": "synth",
        "retriever": {"type": "bm25", "params": {"top_k": 10, "cache_matrices": False}},
        "reader": {"type": "extractive", "params": {}},
    }
    ablations = [
        {"name": "k5", "retriever": {"params": {"top_k": 5}}},
        {"name": "b0", "retriever": {"params": {"b": 0.0}}},
    ]
    cfgs = generate_ablation_configs(base, ablations)
    assert cfgs[0]["name"] == "synth_bm25_k5"
    assert cfgs[0]["retriever"]["params"]["top_k"] == 5
    assert cfgs[1]["retriever"]["params"]["b"] == 0.0
    assert cfgs[1]["retriever"]["params"]["top_k"] == 10  # base preserved

    results = run_ablation(
        base,
        {"datasets_root": str(dataset_dir)},
        tmp_path / "ablations",
        ablations,
    )
    assert all(r["status"] == "ok" for r in results.values())
    assert (tmp_path / "ablations" / "ablation_results.json").exists()


def test_error_analysis():
    from osr_tpu.pipeline.errors import categorize_errors, generate_error_report

    preds = [
        {"qid": "q_ok", "answer": "real answer", "contexts": [{"docid": "d1"}]},
        {"qid": "q_nogold", "answer": "a", "contexts": [{"docid": "d1"}]},
        {"qid": "q_noret", "answer": "a", "contexts": []},
        {"qid": "q_miss", "answer": "a", "contexts": [{"docid": "dX"}]},
        {"qid": "q_reader", "answer": "No sufficient context available.",
         "contexts": [{"docid": "d5"}]},
    ]
    qrels = {
        "q_ok": {"d1": 1},
        "q_noret": {"d2": 1},
        "q_miss": {"d3": 1},
        "q_reader": {"d5": 1},
    }
    buckets = categorize_errors(preds, qrels)
    assert buckets["ok"] == ["q_ok"]
    assert buckets["no_gold_standard"] == ["q_nogold"]
    assert buckets["no_retrieval"] == ["q_noret"]
    assert buckets["retriever_miss"] == ["q_miss"]
    assert buckets["reader_issue"] == ["q_reader"]

    report = generate_error_report(preds, qrels)
    assert report["total_predictions"] == 5
    assert report["retrieval_performance"]["avg_recall"] == pytest.approx(
        (1 + 0 + 0 + 1) / 4
    )


def test_efficiency_benchmark():
    from osr_tpu.pipeline.efficiency import (
        benchmark_index_scaling,
        run_comprehensive_benchmark,
    )

    corpus = zipf_corpus(num_docs=60, vocab_size=200, avg_len=20)
    queries = {
        f"q{i}": t for i, t in enumerate(zipf_queries(6, 200, 4).values())
    }
    report = run_comprehensive_benchmark(
        corpus, queries, top_k=5, batch_sizes=(1, 4)
    )
    assert report["throughput_qps"] > 0
    assert report["build"]["build_time_s"] > 0
    assert "p50_ms" in report["latency"]["batch_1"]

    scaling = benchmark_index_scaling(corpus, sizes=(20, 40))
    assert len(scaling) == 2
    assert scaling[1]["corpus_size"] == 40


def test_cli_run_and_validate(config_file, dataset_dir, capsys):
    from osr_tpu.cli import main

    path, out = config_file
    assert main(["validate", str(dataset_dir / "synth"), "--stats"]) == 0
    assert main(["run", "--config", str(path)]) == 0
    captured = capsys.readouterr()
    assert "Completed 2/2 experiments" in captured.out

    # generation eval CLI over produced predictions
    refs = {
        f"q{i}": "term1 answer text" for i in range(12)
    }
    refs_path = out / "refs.json"
    refs_path.write_text(json.dumps(refs))
    assert (
        main(
            [
                "evaluate",
                "--predictions",
                str(out / "synth_bm25_preds.json"),
                "--references",
                str(refs_path),
            ]
        )
        == 0
    )

    # error analysis CLI
    assert (
        main(
            [
                "errors",
                "--predictions",
                str(out / "synth_bm25_preds.json"),
                "--dataset",
                str(dataset_dir / "synth"),
            ]
        )
        == 0
    )


def test_monitoring(tmp_path):
    from osr_tpu.utils.monitoring import StatsMonitor

    mon = StatsMonitor(tmp_path, log_interval=0)
    q = mon.start_query("q1")
    mon.end_query(q, num_results=5)
    q2 = mon.start_query("q2")
    mon.end_query(q2, error="boom")
    stats = mon.get_current_stats()
    assert stats["total_queries"] == 2
    assert stats["successful_queries"] == 1
    assert stats["failed_queries"] == 1
    assert stats["success_rate"] == 0.5
    logs = list(tmp_path.glob("stats_*.jsonl"))
    assert logs and json.loads(logs[0].read_text().splitlines()[-1])["total_queries"] >= 1
    mon.reset_stats()
    assert mon.get_current_stats()["total_queries"] == 0


def test_hardware_detection():
    from osr_tpu.utils.hardware import (
        detect_hardware_capabilities,
        get_optimization_recommendations,
        recommended_batch_size,
    )

    caps = detect_hardware_capabilities()
    assert caps["cores"] >= 1
    assert caps["num_devices"] >= 1  # CPU test platform has 8
    assert recommended_batch_size(caps) >= 8
    recs = get_optimization_recommendations(caps)
    assert "scoring" in recs


def test_validate_backend():
    from osr_tpu.utils.hardware import validate_backend

    v = validate_backend()
    assert v["ok"], v
    assert v["platform"] == "cpu"  # test platform
