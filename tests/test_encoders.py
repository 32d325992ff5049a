"""Encoder tests using a random-weight tiny BERT (no network access)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from osr_tpu.encoders import HFEncoder, encode_corpus_to_npy
from osr_tpu.retrieval.registry import RetrieverRegistry


class _CharTokenizer:
    """Minimal whitespace tokenizer exposing the HF call signature."""

    vocab_size = 100

    def __call__(self, texts, padding, truncation, max_length, return_tensors):
        ids = [
            [min(99, 2 + (hash(w) % 90)) for w in t.split()][:max_length] or [1]
            for t in texts
        ]
        width = max(len(x) for x in ids)
        input_ids = np.zeros((len(ids), width), dtype=np.int64)
        mask = np.zeros((len(ids), width), dtype=np.int64)
        for i, x in enumerate(ids):
            input_ids[i, : len(x)] = x
            mask[i, : len(x)] = 1
        batch = {"input_ids": input_ids, "attention_mask": mask}
        if return_tensors == "pt":
            import torch

            batch = {k: torch.from_numpy(v) for k, v in batch.items()}
        return batch


@pytest.fixture(scope="module")
def encoder():
    from transformers import BertConfig, BertModel

    config = BertConfig(
        vocab_size=100,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
    )
    model = BertModel(config)
    model.eval()
    return HFEncoder(
        "tiny-random-bert",
        max_length=32,
        batch_size=4,
        model=model,
        tokenizer=_CharTokenizer(),
    )


def test_encode_shapes_and_norms(encoder):
    emb = encoder.encode(["hello world", "bonds pay interest", "etf"])
    assert emb.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
    # deterministic
    np.testing.assert_allclose(encoder.encode_one("hello world"), emb[0], rtol=1e-5)
    # batching doesn't change results
    one_by_one = np.stack(
        [encoder.encode_one(t) for t in ["hello world", "bonds pay interest", "etf"]]
    )
    np.testing.assert_allclose(one_by_one, emb, rtol=1e-4, atol=1e-5)


def test_real_encoder_through_dense_retriever(encoder, tmp_path):
    corpus = {
        "d1": {"text": "exchange traded funds hold many securities"},
        "d2": {"text": "bonds pay interest to holders"},
        "d3": {"text": "savings accounts are insured"},
    }
    r = RetrieverRegistry.create(
        {
            "type": "dpr",
            "params": {
                "embedding_fn": encoder.encode,
                "query_embedding_fn": encoder.encode_one,
            },
        }
    )
    r.build_index_from_corpus(corpus)
    res = r.search({"q": "exchange traded funds hold many securities"}, top_k=2)
    # the query identical to d1's text must retrieve d1 first
    assert list(res["q"])[0] == "d1"

    # embeddings_path flow
    path = encode_corpus_to_npy(corpus, encoder, tmp_path / "emb.npy")
    r2 = RetrieverRegistry.create(
        {
            "type": "contriever",
            "params": {
                "embeddings_path": str(path),
                "query_embedding_fn": encoder.encode_one,
            },
        }
    )
    r2.build_index_from_corpus(corpus)
    res2 = r2.search({"q": "bonds pay interest to holders"}, top_k=1)
    assert list(res2["q"])[0] == "d2"
