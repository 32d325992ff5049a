import numpy as np
import pytest

from osr_tpu.index.dense import synthetic_corpus_embeddings
from osr_tpu.retrieval.service import RetrievalService
from osr_tpu.storage.documents import Document

from tests.reference_impl import zipf_corpus


def test_service_end_to_end(tmp_path):
    corpus = zipf_corpus(num_docs=60, vocab_size=200, avg_len=25)
    docs = [
        Document(id=d, text=rec["text"], title=rec["title"])
        for d, rec in corpus.items()
    ]
    with RetrievalService(tmp_path / "corpus.osrd", create=True) as svc:
        assert svc.add_documents(docs) == 60
        svc.build_bm25_index()
        hits = svc.search_bm25({"q": "term150 term180"}, top_k=5)
        assert len(hits["q"]) > 0
        results = svc.get_search_results(hits["q"])
        assert results and "text" in results[0]
        assert results[0]["score"] >= results[-1]["score"]

        # dense path
        emb = synthetic_corpus_embeddings(60, dim=32, seed=1)
        svc.set_embeddings(list(corpus.keys()), emb)
        dense_hits = svc.search_by_vector(emb[3], k=5)
        assert dense_hits[0]["doc_id"] == "doc3"  # self-similarity wins

        stats = svc.get_stats()
        assert stats["store"]["num_documents"] == 60
        assert stats["sparse"]["num_docs"] == 60
        assert stats["dense"]["dim"] == 32

        doc = svc.get_document("doc5")
        assert doc is not None and doc.title == "Document 5"
        svc.clear_cache()


def test_service_errors(tmp_path):
    svc = RetrievalService(tmp_path / "x.osrd", create=True)
    with pytest.raises(ValueError):
        svc.search_bm25({"q": "hello"})
    with pytest.raises(ValueError):
        svc.search_by_vector(np.zeros(8, np.float32))
    with pytest.raises(ValueError):
        svc.build_bm25_index()  # empty store
    svc.close()
