"""Public testing utilities: synthetic data, correctness validators,
implementation comparison.

Capability parity with the reference's core test framework (reference
tests/core_test.py: SyntheticDataGenerator :203-252, CorrectnessValidator
:120-200, PerformanceBenchmark :255-318). These are shipped as part of the
package (not just the test tree) so downstream users can validate custom
retrievers the same way the framework validates itself.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Sequence

import numpy as np

from osr_tpu.index.dense import synthetic_corpus_embeddings


class SyntheticDataGenerator:
    """Zipf-distributed corpora/queries and clustered embeddings, seeded."""

    def __init__(self, seed: int = 42):
        self.seed = seed

    def zipf_corpus(
        self,
        num_docs: int,
        vocab_size: int = 10_000,
        avg_len: int = 100,
        word_prefix: str = "term",
        min_len: int = 3,
    ) -> Dict[str, Dict[str, str]]:
        rng = np.random.RandomState(self.seed)
        ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
        probs = 1.0 / ranks
        probs /= probs.sum()
        cum = np.cumsum(probs)
        lengths = np.maximum(
            min_len,
            rng.gamma(2.0, avg_len / 2.0, size=num_docs).astype(np.int64),
        )
        total = int(lengths.sum())
        token_ids = np.searchsorted(cum, rng.rand(total))
        offsets = np.concatenate([[0], np.cumsum(lengths)])
        corpus = {}
        for d in range(num_docs):
            ids = token_ids[offsets[d] : offsets[d + 1]]
            corpus[f"doc{d}"] = {
                "text": " ".join(f"{word_prefix}{i}" for i in ids),
                "title": f"Document {d}",
            }
        return corpus

    def queries(
        self,
        num_queries: int,
        vocab_size: int = 10_000,
        avg_terms: int = 8,
        word_prefix: str = "term",
        min_terms: int = 1,
    ) -> Dict[str, str]:
        rng = np.random.RandomState(self.seed + 1)
        ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
        probs = 1.0 / ranks
        probs /= probs.sum()
        cum = np.cumsum(probs)
        out = {}
        for i in range(num_queries):
            n = max(min_terms, int(rng.poisson(avg_terms)))
            ids = np.searchsorted(cum, rng.rand(n))
            out[f"q{i}"] = " ".join(f"{word_prefix}{j}" for j in ids)
        return out

    def embeddings(self, num_docs: int, dim: int = 768) -> np.ndarray:
        return synthetic_corpus_embeddings(num_docs, dim, seed=self.seed)


def spearman_correlation(a: Sequence[float], b: Sequence[float]) -> float:
    """Spearman rank correlation (scipy-free)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.size < 2:
        return 1.0
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra**2).sum() * (rb**2).sum())
    return float((ra * rb).sum() / denom) if denom else 0.0


class CorrectnessValidator:
    """Numeric validators with the reference suite's acceptance thresholds."""

    @staticmethod
    def validate_scores(
        got: np.ndarray,
        want: np.ndarray,
        atol: float = 1e-3,
        rtol: float = 1e-3,
    ) -> Dict[str, Any]:
        got = np.asarray(got, dtype=np.float64)
        want = np.asarray(want, dtype=np.float64)
        abs_err = np.abs(got - want)
        rel_err = abs_err / np.maximum(np.abs(want), 1e-9)
        ok = bool(np.all((abs_err <= atol) | (rel_err <= rtol)))
        return {
            "passed": ok,
            "max_abs_error": float(abs_err.max(initial=0.0)),
            "max_rel_error": float(rel_err.max(initial=0.0)),
        }

    @staticmethod
    def validate_topk_ranking(
        got_ids: Sequence[int],
        want_ids: Sequence[int],
        min_overlap: float = 0.9,
    ) -> Dict[str, Any]:
        """Set overlap plus Spearman correlation of the RANK POSITIONS of
        the common ids (the reference's validator semantics, reference
        tests/core_test.py:145-173 — correlating the two already-sorted
        score lists would always report ~1.0)."""
        k = len(want_ids)
        overlap = len(set(got_ids) & set(want_ids)) / k if k else 1.0
        got_pos = {d: i for i, d in enumerate(got_ids)}
        want_pos = {d: i for i, d in enumerate(want_ids)}
        common = [d for d in want_ids if d in got_pos]
        if len(common) >= 2:
            corr = spearman_correlation(
                [got_pos[d] for d in common],
                [want_pos[d] for d in common],
            )
        else:
            corr = 1.0
        return {
            "passed": overlap >= min_overlap,
            "precision_at_k": overlap,
            "rank_spearman": corr,
        }

    @staticmethod
    def validate_quantization(
        original: np.ndarray,
        reconstructed: np.ndarray,
        min_cosine: float = 0.95,
    ) -> Dict[str, Any]:
        original = np.asarray(original, dtype=np.float64)
        reconstructed = np.asarray(reconstructed, dtype=np.float64)
        mse = float(((original - reconstructed) ** 2).mean())
        mae = float(np.abs(original - reconstructed).mean())
        num = (original * reconstructed).sum(axis=-1)
        den = np.linalg.norm(original, axis=-1) * np.linalg.norm(
            reconstructed, axis=-1
        )
        cos = float((num / np.maximum(den, 1e-12)).mean())
        return {
            "passed": cos >= min_cosine,
            "mse": mse,
            "mae": mae,
            "mean_cosine": cos,
        }


class PerformanceBenchmark:
    """Time competing implementations on identical inputs."""

    def __init__(self, warmup: int = 1, runs: int = 5):
        self.warmup = warmup
        self.runs = runs

    def compare_implementations(
        self,
        implementations: Dict[str, Callable[[], Any]],
        baseline: str,
    ) -> Dict[str, Dict[str, float]]:
        import jax

        results: Dict[str, Dict[str, float]] = {}
        for name, fn in implementations.items():
            for _ in range(self.warmup):
                jax.block_until_ready(fn())
            times = []
            for _ in range(self.runs):
                t0 = time.perf_counter()
                jax.block_until_ready(fn())
                times.append(time.perf_counter() - t0)
            results[name] = {"median_s": float(np.median(times))}
        base = results[baseline]["median_s"]
        for name in results:
            results[name]["speedup_vs_baseline"] = (
                base / results[name]["median_s"]
                if results[name]["median_s"]
                else float("inf")
            )
        return results
