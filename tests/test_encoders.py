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
        # zlib.crc32 (not hash()) so token ids are stable across processes:
        # hash() is salted per interpreter, which made this fixture flaky.
        import zlib

        ids = [
            [min(99, 2 + (zlib.crc32(w.encode()) % 90)) for w in t.split()][
                :max_length
            ]
            or [1]
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
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(42)
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


def test_pad_to_max_matches_dynamic_padding(encoder):
    """pad_to_max (one XLA compile shape) returns the same embeddings as
    dynamic padding — masked mean pooling ignores the filler."""
    texts = ["hello world", "bonds pay interest to holders", "etf"]
    fixed = HFEncoder(
        "tiny-random-bert",
        max_length=32,
        batch_size=4,
        model=encoder.model,
        tokenizer=_BertLikeTokenizer(),
        pad_to_max=True,
    )
    dyn = HFEncoder(
        "tiny-random-bert",
        max_length=32,
        batch_size=4,
        model=encoder.model,
        tokenizer=_BertLikeTokenizer(),
    )
    np.testing.assert_allclose(
        fixed.encode(texts), dyn.encode(texts), rtol=1e-4, atol=1e-5
    )
    assert fixed.encode(texts).shape == (3, 32)


class _BertLikeTokenizer(_CharTokenizer):
    """_CharTokenizer + real padding='max_length' semantics."""

    def __call__(self, texts, padding, truncation, max_length, return_tensors):
        batch = super().__call__(
            texts, True, truncation, max_length, "np"
        )
        if padding == "max_length":
            ids = batch["input_ids"]
            pad = max_length - ids.shape[1]
            if pad > 0:
                batch = {
                    k: np.pad(v, ((0, 0), (0, pad))) for k, v in batch.items()
                }
        if return_tensors == "pt":
            import torch

            batch = {k: torch.from_numpy(v) for k, v in batch.items()}
        return batch


def test_standin_artifact_pipeline(tmp_path):
    """The committed dense-encoder artifact's pipeline (locally built
    seeded BERT + corpus vocab -> encode -> int8 -> search -> IR metrics)
    runs end to end and shows real self-retrieval signal
    (tools/bench_dense_encoder.py is the full-size version)."""
    from osr_tpu.metrics.ir import recall_at_k
    from osr_tpu.retrieval.engine import DenseSearchEngine
    from tools.bench_dense_encoder import build_standin_encoder

    rng = np.random.RandomState(3)
    words = [f"t{i}" for i in range(300)]
    corpus, texts = {}, []
    for i in range(120):
        t = " ".join(words[w] for w in rng.randint(0, 300, 20))
        corpus[f"d{i}"] = t
        texts.append(t)
    enc = build_standin_encoder(sorted(set(words)), hidden=64, layers=2)
    emb = enc.encode(texts)
    assert emb.shape == (120, 64)
    queries, qrels = {}, {}
    for qi in range(16):
        src = int(rng.randint(120))
        ws = texts[src].split()
        queries[f"q{qi}"] = " ".join(
            ws[p] for p in rng.choice(len(ws), 8, replace=False)
        )
        qrels[f"q{qi}"] = {f"d{src}": 1}
    q_emb = enc.encode(list(queries.values()))
    eng = DenseSearchEngine(list(corpus), emb, quantization="symmetric")
    res = eng.search(
        {q: q_emb[i] for i, q in enumerate(queries)},
        top_k=10,
        min_score=-1e30,
    )
    # Chance recall@10 = 10/120 ~ 0.083; the random-projection encoder
    # must do much better on queries quoting their source document.
    assert recall_at_k(res, qrels, 10) >= 0.4


def test_hashing_encoder_deterministic_and_normalized():
    from osr_tpu.encoders import HashingEncoder

    enc = HashingEncoder(dim=256)
    a = enc.encode_one("an exchange traded fund holds securities")
    b = enc.encode_one("an exchange traded fund holds securities")
    np.testing.assert_array_equal(a, b)
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-5
    # lexical similarity orders cosine: shared words beat disjoint ones
    c = enc.encode_one("an exchange traded fund holds bonds")
    d = enc.encode_one("completely unrelated words entirely different")
    assert float(a @ c) > float(a @ d)
    # batch API stacks the same vectors
    batch = enc.encode(["an exchange traded fund holds securities"])
    np.testing.assert_array_equal(batch[0], a)


def test_registry_hashing_encoder_dense_quality():
    """Dense retrieval with encoder='hashing' has REAL ranking quality:
    self-retrieval by a quote from the document finds the document."""
    from osr_tpu.retrieval.registry import RetrieverRegistry
    from osr_tpu.testing import SyntheticDataGenerator

    gen = SyntheticDataGenerator(seed=42)
    corpus = gen.zipf_corpus(800, 5_000, avg_len=60, word_prefix="t")
    ids = list(corpus)
    r = RetrieverRegistry.create(
        {"type": "dpr", "params": {"encoder": "hashing"}}
    )
    r.build_index_from_corpus(corpus)
    queries = {
        f"q{i}": " ".join(corpus[ids[i]]["text"].split()[:12])
        for i in range(20)
    }
    res = r.search(queries, top_k=5)
    hits = sum(1 for i in range(20) if ids[i] in res[f"q{i}"])
    assert hits >= 16, hits

    with pytest.raises(ValueError):
        RetrieverRegistry.create(
            {"type": "dpr", "params": {"encoder": "nonsense"}}
        )


def test_hashing_encoder_idf_fit_once_and_weighting():
    from osr_tpu.encoders import HashingEncoder

    # 'the' appears in every doc; 'zebra' in one. IDF must down-weight
    # the ubiquitous feature relative to the rare one.
    corpus_texts = [f"the document number {i}" for i in range(50)] + [
        "the zebra document"
    ]
    enc = HashingEncoder(dim=256, idf=True)
    emb = enc.encode(corpus_texts)  # first call fits
    assert emb.shape == (51, 256)
    assert enc._n_docs == 51

    h_the = enc._hash("the")
    h_zebra = enc._hash("zebra")
    assert enc._idf(h_zebra) > enc._idf(h_the) > 0

    # Later encodes must NOT refit (query batches stay consistent).
    q1 = enc.encode_one("the zebra")
    enc.encode(["some unrelated probe text"])
    assert enc._n_docs == 51
    np.testing.assert_array_equal(enc.encode_one("the zebra"), q1)

    # A query sharing only the rare term must prefer the rare doc more
    # strongly under IDF than without it.
    plain = HashingEncoder(dim=256, idf=False)
    pe = plain.encode(corpus_texts)
    q_i = enc.encode_one("zebra facts")
    q_p = plain.encode_one("zebra facts")
    sims_i = emb @ q_i
    sims_p = pe @ q_p
    assert np.argmax(sims_i) == 50 == np.argmax(sims_p)
    # Margin over the best non-target doc grows with IDF.
    margin_i = sims_i[50] - np.max(sims_i[:50])
    margin_p = sims_p[50] - np.max(sims_p[:50])
    assert margin_i > margin_p


def test_registry_hashing_idf_end_to_end():
    from osr_tpu.retrieval.registry import RetrieverRegistry

    corpus = {
        f"d{i}": {"text": f"the common filler words {('rareterm' if i == 7 else 'plain')} item {i}"}
        for i in range(30)
    }
    r = RetrieverRegistry.create(
        {
            "type": "dpr",
            "params": {"encoder": "hashing_idf", "embedding_dim": 128,
                       "cache_matrices": False},
        }
    )
    r.build_index_from_corpus(corpus)
    res = r.search({"q": "rareterm item"}, top_k=3)
    assert list(res["q"])[0] == "d7"


def test_hashing_encoder_save_load_roundtrip(tmp_path):
    from osr_tpu.encoders import HashingEncoder

    corpus = [f"the common doc {i} {'rare' if i == 3 else 'usual'}"
              for i in range(20)]
    queries = ["rare doc", "the usual", "unseen thing"]

    try:
        import osr_tpu.native  # noqa: F401
        backends = ["force", "off"]
    except ImportError:
        backends = ["off"]

    # Save from each available backend, load into each: query vectors
    # must be identical to the original fitted encoder's everywhere.
    for src in backends:
        enc = HashingEncoder(dim=128, idf=True, native=src)
        emb = enc.encode(corpus)
        p = tmp_path / f"enc_{src}.npz"
        enc.save(p)
        for dst in backends:
            enc2 = HashingEncoder.load(p, native=dst)
            assert enc2._fitted and enc2._n_docs == 20
            for q in queries:
                np.testing.assert_array_equal(
                    enc.encode_one(q), enc2.encode_one(q)
                )
            # Re-encoding the corpus reproduces the original embeddings
            # (and must NOT refit).
            np.testing.assert_array_equal(enc2.encode(corpus[:5]), emb[:5])
            assert enc2._n_docs == 20


def test_hashing_encoder_unfitted_idf_warns(caplog):
    import logging

    from osr_tpu.encoders import HashingEncoder

    enc = HashingEncoder(dim=64, idf=True)
    with caplog.at_level(logging.WARNING, logger="osr_tpu.encoders"):
        enc.encode_one("some query")
    assert any("before fit" in r.message for r in caplog.records)
