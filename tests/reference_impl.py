"""Pure-NumPy ground-truth implementations and synthetic data generators.

This is the correctness oracle for the TPU kernels, playing the role of the
reference's ``ReferenceBM25`` pure-Python scorer (reference
tests/bm25_performance.py:15-72) and its Zipf synthetic-corpus fixtures
(reference tests/bm25_performance.py:241-272, tests/core_test.py:203-252).
Implemented independently over a *dense* TF matrix so a bug in the
framework's sparse layout cannot be mirrored here.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, List, Tuple

import numpy as np

_TOKEN_RE = re.compile(r"\b\w+\b")


def _tokenize(text: str) -> List[str]:
    return _TOKEN_RE.findall(text.lower())


class DenseOracleScorer:
    """Dense-matrix BM25 / TF-IDF scorer with the reference's exact formulas."""

    def __init__(
        self,
        corpus: Dict[str, Dict],
        method: str = "bm25",
        k1: float = 1.2,
        b: float = 0.75,
    ):
        self.method = method
        self.k1, self.b = k1, b
        self.doc_ids = list(corpus.keys())
        token_lists = []
        vocab = set()
        for d in self.doc_ids:
            doc = corpus[d]
            text = doc.get("text", "") if isinstance(doc, dict) else doc
            toks = _tokenize(text)
            token_lists.append(toks)
            vocab.update(toks)
        self.vocab = {t: i for i, t in enumerate(sorted(vocab))}
        n, v = len(self.doc_ids), len(self.vocab)
        self.tf = np.zeros((n, max(v, 1)), dtype=np.float64)
        self.doc_lengths = np.zeros(n, dtype=np.float64)
        for i, toks in enumerate(token_lists):
            self.doc_lengths[i] = len(toks)
            for t, c in Counter(toks).items():
                self.tf[i, self.vocab[t]] = c
        df = (self.tf > 0).sum(axis=0)
        self.avgdl = self.doc_lengths.mean() if n else 0.0
        if method == "bm25":
            self.idf = np.log((n - df + 0.5) / (df + 0.5))
        else:
            self.idf = np.log(n / (df + 1.0))

    def query_tf(self, query_text: str) -> np.ndarray:
        q = np.zeros(len(self.vocab), dtype=np.float64)
        for t, c in Counter(_tokenize(query_text)).items():
            if t in self.vocab:
                q[self.vocab[t]] = c
        return q

    def score(self, query_text: str) -> np.ndarray:
        q = self.query_tf(query_text)
        if self.method == "bm25":
            norm = self.k1 * (
                1.0 - self.b + self.b * self.doc_lengths / self.avgdl
            )
            sat = (
                self.tf * (self.k1 + 1.0) / (self.tf + norm[:, None])
            )  # 0 where tf==0
            sat = np.where(self.tf > 0, sat, 0.0)
            return (sat * (self.idf * q)[None, :]).sum(axis=1)
        return (self.tf * (self.idf * q)[None, :]).sum(axis=1)

    def topk(self, query_text: str, k: int) -> Tuple[np.ndarray, np.ndarray]:
        scores = self.score(query_text)
        order = np.argsort(-scores, kind="stable")[:k]
        return order, scores[order]


def zipf_corpus(
    num_docs: int = 200,
    vocab_size: int = 500,
    avg_len: int = 40,
    seed: int = 42,
) -> Dict[str, Dict]:
    """Zipf-distributed synthetic corpus (fixed seed 42, like the reference)."""
    rng = np.random.RandomState(seed)
    words = [f"term{i}" for i in range(vocab_size)]
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    corpus = {}
    for d in range(num_docs):
        length = max(1, int(rng.gamma(2.0, avg_len / 2.0)))
        ids = rng.choice(vocab_size, size=length, p=probs)
        corpus[f"doc{d}"] = {
            "text": " ".join(words[i] for i in ids),
            "title": f"Document {d}",
        }
    return corpus


def zipf_queries(
    num_queries: int = 20,
    vocab_size: int = 500,
    terms_per_query: int = 5,
    seed: int = 123,
) -> Dict[str, str]:
    rng = np.random.RandomState(seed)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    return {
        f"q{i}": " ".join(
            f"term{j}"
            for j in rng.choice(
                vocab_size, size=rng.randint(1, terms_per_query + 1), p=probs
            )
        )
        for i in range(num_queries)
    }
