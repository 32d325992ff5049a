import numpy as np
import pytest

from osr_tpu.readers.registry import ReaderRegistry
from osr_tpu.retrieval.registry import RetrieverRegistry

from tests.reference_impl import zipf_corpus, zipf_queries


@pytest.fixture(scope="module")
def corpus():
    return zipf_corpus(num_docs=120, vocab_size=300, avg_len=30)


def test_sparse_retriever_via_registry(corpus, tmp_path_factory):
    cache = tmp_path_factory.mktemp("rag_cache")
    cfg = {
        "type": "bm25_custom",
        "model": None,
        "params": {"top_k": 50, "k1": 1.2, "b": 0.75, "cache_dir": str(cache)},
    }
    r = RetrieverRegistry.create(cfg)
    r.build_index_from_corpus(corpus)
    res = r.search({"q1": "term200 term250"}, top_k=5)
    assert "q1" in res and len(res["q1"]) > 0
    # cache round-trip: a second build must load from disk and search equally
    r2 = RetrieverRegistry.create(cfg)
    r2.build_index_from_corpus(corpus)
    res2 = r2.search({"q1": "term200 term250"}, top_k=5)
    assert list(res["q1"].items()) == pytest.approx(list(res2["q1"].items()))


def test_dense_retriever_via_registry(corpus):
    r = RetrieverRegistry.create(
        {
            "type": "dpr",
            "model": "synthetic",
            "params": {"embedding_dim": 64},
        }
    )
    r.build_index_from_corpus(corpus)
    res = r.search({"q1": "what is alpha", "q2": ""}, top_k=5)
    assert len(res["q1"]) > 0
    assert res["q2"] == {}


def test_dense_retriever_sparse_scoring_mode(corpus):
    # The reference pipeline's measured dpr config actually runs TF-IDF
    # sparse scoring (reference evaluate_rag_pipeline.py:392-399).
    r = RetrieverRegistry.create(
        {"type": "contriever", "params": {"scoring": "sparse", "cache_dir": None}}
    )
    r.build_index_from_corpus(corpus)
    res = r.search({"q1": "term200"}, top_k=5)
    assert len(res["q1"]) > 0


def test_hybrid_retriever(corpus):
    r = RetrieverRegistry.create(
        {
            "type": "hybrid",
            "params": {
                "sparse_weight": 0.3,
                "dense_weight": 0.7,
                "embedding_dim": 64,
                "cache_dir": None,
            },
        }
    )
    r.build_index_from_corpus(corpus)
    res = r.search({"q1": "term200 term123"}, top_k=5)
    assert len(res["q1"]) > 0
    scores = list(res["q1"].values())
    assert scores == sorted(scores, reverse=True)


def test_unknown_retriever():
    with pytest.raises(ValueError):
        RetrieverRegistry.create({"type": "nope"})


def test_readers():
    extractive = ReaderRegistry.create(
        {"type": "extractive", "params": {"max_answer_length": 100}}
    )
    contexts = [
        "Short.",
        "An exchange traded fund is a basket of securities that trades on an "
        "exchange. It tracks an index. Other sentences exist here too.",
    ]
    ans = extractive.generate_answer("what is an exchange traded fund", contexts)
    assert "exchange traded fund" in ans.lower()
    assert extractive.generate_answer("", []) == "No sufficient context available."

    generative = ReaderRegistry.create("generative")
    ans = generative.generate_answer("what is an etf", ["ETFs are funds."])
    assert ans.startswith("According to the sources,")
    # dedup: identical leading words collapse
    ans2 = generative.generate_answer(
        "how does it work", ["same words here alpha", "same words here alpha"]
    )
    assert ans2.count("same words here") == 1

    llm = ReaderRegistry.create({"type": "llm", "params": {"model": "m"}})
    assert "m" in llm.generate_answer("q", ["ctx"])
    llm2 = ReaderRegistry.create(
        {"type": "llm", "params": {"complete_fn": lambda p: "ANSWER"}}
    )
    assert llm2.generate_answer("q", ["ctx"]) == "ANSWER"

    with pytest.raises(ValueError):
        ReaderRegistry.create({"type": "bogus"})


def test_sparse_retriever_plumbs_engine_params():
    """topk_mode / narrow_m / narrow_backend / score_chunk_rows reach the
    engine from retriever params (YAML-configurable tuning)."""
    from osr_tpu.retrieval.registry import RetrieverRegistry
    from osr_tpu.testing import SyntheticDataGenerator

    gen = SyntheticDataGenerator(seed=42)
    corpus = gen.zipf_corpus(6000, 20_000, avg_len=60, word_prefix="t")
    queries = gen.queries(8, 20_000, avg_terms=8, word_prefix="t")
    r = RetrieverRegistry.create(
        {
            "type": "bm25",
            "params": {
                "cache_dir": None,
                "narrow_m": 8,
                "score_chunk_rows": 4096,
            },
        }
    )
    r.build_index_from_corpus(corpus)
    assert r.engine.narrow_m == 8
    assert r.engine.stats().get("score_chunks") == 2
    plain = RetrieverRegistry.create(
        {"type": "bm25", "params": {"cache_dir": None}}
    )
    plain.build_index_from_corpus(corpus)
    assert r.search(queries, top_k=10) == plain.search(queries, top_k=10)
