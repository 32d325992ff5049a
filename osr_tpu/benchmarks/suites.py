"""Concrete benchmark suites: BM25, top-k, quantization, storage.

Capability parity with the reference's self-contained test/benchmark suites
(reference tests/bm25_performance.py, tests/topk_selection.py,
tests/embedding_quantizations.py, tests/memory_mapping.py): each suite
checks correctness against an independent baseline and measures performance
against a CPU reference implementation, producing PASS/FAIL results with
letter grades.
"""

from __future__ import annotations

import tempfile
import time
from pathlib import Path
from typing import List, Optional

import numpy as np

from osr_tpu.benchmarks.framework import (
    BenchmarkResult,
    BenchmarkSuite,
    grade_performance,
)
from osr_tpu.index.builder import SparseIndexBuilder
from osr_tpu.retrieval.engine import SparseSearchEngine
from osr_tpu.testing import (
    CorrectnessValidator,
    SyntheticDataGenerator,
    spearman_correlation,
)


def _build_csr(index):
    """Rebuild a scipy CSR weight matrix from the hybrid layout (head
    dequantized if stored int8, so the baseline scores exactly what the
    layout stores)."""
    from scipy.sparse import csr_matrix

    layout = index.layout
    n = index.num_docs
    f = layout.head_terms
    head = np.asarray(layout.head[:n], dtype=np.float32)
    if layout.head_dtype == "int8" and layout.head_scales is not None:
        head = head * layout.head_scales[None, :]
    rows_h, cols_h = np.nonzero(head)
    vals_h = head[rows_h, cols_h]
    n_tail_terms = layout.post_ptr.shape[0] - 1
    term_of = (
        np.repeat(
            np.arange(n_tail_terms, dtype=np.int64),
            np.diff(layout.post_ptr),
        )
        + f
    )
    rows = np.concatenate([rows_h, layout.post_rows])
    cols = np.concatenate([cols_h, term_of])
    vals = np.concatenate([vals_h, layout.post_weights])
    return csr_matrix(
        (vals, (rows, cols)), shape=(n, index.vocab_size), dtype=np.float32
    )


def _scipy_csr_baseline(index, queries_tf, w=None):
    """CPU baseline scorer: scipy CSR matvec over the same precomputed
    weights (the fair 'optimized CPU' comparison point)."""
    if w is None:
        w = _build_csr(index)
    return w @ queries_tf.T  # (N, B)


class BM25Suite(BenchmarkSuite):
    name = "bm25"

    def __init__(self, num_docs: int = 500, vocab_size: int = 1500):
        self.num_docs = num_docs
        self.vocab_size = vocab_size

    def setup(self) -> None:
        gen = SyntheticDataGenerator()
        self.corpus = gen.zipf_corpus(self.num_docs, self.vocab_size, avg_len=60)
        self.queries = gen.queries(16, self.vocab_size)
        # f32 head: the parity row validates the KERNELS at atol 1e-3; the
        # production int8 default is covered by the quantized-overlap row.
        self.index = SparseIndexBuilder(
            method="bm25", head_dtype="f32"
        ).build(self.corpus)
        self.engine = SparseSearchEngine(self.index, cache_queries=False)
        self.index_int8 = SparseIndexBuilder(
            method="bm25", head_dtype="int8"
        ).build(self.corpus)
        self.engine_int8 = SparseSearchEngine(
            self.index_int8, cache_queries=False
        )

    def run(self) -> List[BenchmarkResult]:
        out: List[BenchmarkResult] = []
        texts = list(self.queries.values())

        # Correctness vs scipy CSR baseline over the same weights.
        t0 = time.perf_counter()
        got = self.engine.score_all(texts)  # (B, N)
        tok = self.index.tokenizer()
        qtf = np.zeros((len(texts), self.index.vocab_size), dtype=np.float32)
        for i, t in enumerate(texts):
            for tid, cnt in tok.encode_counts(t):
                qtf[i, tid] = cnt
        want = _scipy_csr_baseline(self.index, qtf).T
        check = CorrectnessValidator.validate_scores(got, want, atol=1e-3)
        out.append(
            BenchmarkResult(
                name="score_parity_vs_csr",
                passed=check["passed"],
                duration_s=time.perf_counter() - t0,
                metrics=check,
            )
        )

        # Ranking consistency.
        t0 = time.perf_counter()
        results = self.engine.search(self.queries, top_k=10)
        rank_ok = True
        overlaps = []
        for i, (qid, text) in enumerate(self.queries.items()):
            want_order = np.argsort(-want[i], kind="stable")[:10]
            want_ids = [
                self.index.doc_ids[j] for j in want_order if want[i][j] > 0
            ]
            got_ids = list(results[qid].keys())
            if not want_ids and not got_ids:
                overlaps.append(1.0)  # all scores <= 0: both correctly empty
                continue
            overlap = len(set(got_ids) & set(want_ids)) / max(len(want_ids), 1)
            overlaps.append(overlap)
            if overlap < 0.9:
                rank_ok = False
        out.append(
            BenchmarkResult(
                name="topk_ranking_overlap",
                passed=rank_ok,
                duration_s=time.perf_counter() - t0,
                metrics={"mean_overlap": float(np.mean(overlaps))},
            )
        )

        # Quantized (int8, the production default) vs exact f32 head:
        # top-10 membership must be near-identical (north-star memory mode).
        t0 = time.perf_counter()
        r_int8 = self.engine_int8.search(self.queries, top_k=10)
        q_overlaps = []
        for qid in self.queries:
            a, b2 = list(results[qid]), list(r_int8[qid])
            if not a and not b2:
                q_overlaps.append(1.0)
                continue
            q_overlaps.append(
                len(set(a) & set(b2)) / max(len(a), len(b2), 1)
            )
        mean_q = float(np.mean(q_overlaps)) if q_overlaps else 1.0
        out.append(
            BenchmarkResult(
                name="int8_head_rank_overlap",
                passed=mean_q >= 0.99,
                duration_s=time.perf_counter() - t0,
                metrics={
                    "mean_overlap": mean_q,
                    "min_overlap": float(np.min(q_overlaps)) if q_overlaps else 1.0,
                    "f32_head_mb": self.index.layout.head.nbytes / 2**20,
                    "int8_head_mb": self.index_int8.layout.head.nbytes / 2**20,
                },
            )
        )

        # Pallas fused head kernel vs the XLA chain (TPU only: the Mosaic
        # kernel has no CPU lowering outside interpret mode). Values must
        # be bit-identical; timing recorded for the report.
        import jax

        if jax.devices()[0].platform == "tpu":
            import jax.numpy as jnp

            from osr_tpu.ops.bm25 import head_scores as _hs
            from osr_tpu.ops.pallas.head import masked_head_scores

            lay = self.index_int8.layout
            enc = self.engine_int8.encode_queries(texts[:8])
            from osr_tpu.ops.bm25 import scatter_query_head

            qhead = scatter_query_head(
                jnp.asarray(enc.head_ids),
                jnp.asarray(enc.head_weights),
                head_terms=lay.head_terms,
            )
            head_dev = jnp.asarray(lay.head)
            scales_dev = jnp.asarray(lay.head_scales)
            valid_dev = jnp.asarray(lay.valid)
            t0 = time.perf_counter()
            want = jnp.where(
                valid_dev[None, :], _hs(head_dev, scales_dev, qhead), -jnp.inf
            )
            want = np.asarray(want)
            t_xla = time.perf_counter() - t0
            t0 = time.perf_counter()
            got = np.asarray(
                masked_head_scores(head_dev, scales_dev, qhead, valid_dev)
            )
            t_pallas = time.perf_counter() - t0
            finite = np.isfinite(want)
            identical = bool(
                np.array_equal(got[finite], want[finite])
                and (np.isinf(got) == np.isinf(want)).all()
            )
            out.append(
                BenchmarkResult(
                    name="pallas_head_kernel_parity",
                    passed=identical,
                    duration_s=t_xla + t_pallas,
                    metrics={
                        "bit_identical": identical,
                        "xla_s": t_xla,
                        "pallas_s": t_pallas,
                    },
                )
            )

        # Throughput vs the scipy CSR baseline (matrix built untimed so
        # only the scoring matvec is measured).
        w = _build_csr(self.index)
        t0 = time.perf_counter()
        self.engine.search(self.queries, top_k=10)
        engine_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        _scipy_csr_baseline(self.index, qtf, w)
        csr_t = time.perf_counter() - t0
        speedup = csr_t / engine_t if engine_t else float("inf")
        out.append(
            BenchmarkResult(
                name="throughput_vs_csr",
                passed=True,
                duration_s=engine_t + csr_t,
                metrics={
                    "engine_s": engine_t,
                    "csr_baseline_s": csr_t,
                    "speedup": speedup,
                    "qps": len(self.queries) / engine_t if engine_t else 0.0,
                },
                grade=grade_performance(speedup, 1.0),
            )
        )
        return out


class TopKSuite(BenchmarkSuite):
    name = "topk"

    def __init__(self, n: int = 50_000, batch: int = 16, k: int = 100):
        self.n, self.batch, self.k = n, batch, k

    def setup(self) -> None:
        rng = np.random.RandomState(42)
        self.scores = rng.randn(self.batch, self.n).astype(np.float32)

    def run(self) -> List[BenchmarkResult]:
        import jax.numpy as jnp

        from osr_tpu.ops.topk import approx_topk_threshold, fast_topk, topk

        out: List[BenchmarkResult] = []
        want_idx = np.argsort(-self.scores, axis=-1)[:, : self.k]
        s = jnp.asarray(self.scores)

        variants = {
            "exact": lambda: topk(s, k=self.k),
            "fast_bf16_rerank": lambda: fast_topk(s, k=self.k),
            "approx_threshold": lambda: approx_topk_threshold(s, k=self.k),
        }
        for name, fn in variants.items():
            t0 = time.perf_counter()
            vals, idx = fn()
            idx = np.asarray(idx)
            dt = time.perf_counter() - t0
            overlaps = [
                len(set(idx[b]) & set(want_idx[b])) / self.k
                for b in range(self.batch)
            ]
            corr = spearman_correlation(
                np.asarray(vals)[0], self.scores[0][want_idx[0]]
            )
            min_overlap = 1.0 if name == "exact" else 0.9
            out.append(
                BenchmarkResult(
                    name=f"topk_{name}",
                    passed=min(overlaps) >= min_overlap,
                    duration_s=dt,
                    metrics={
                        "mean_overlap": float(np.mean(overlaps)),
                        "min_overlap": float(min(overlaps)),
                        "value_spearman": corr,
                    },
                )
            )
        return out


class QuantizationSuite(BenchmarkSuite):
    name = "quantization"

    def __init__(self, num_docs: int = 2000, dim: int = 256):
        self.num_docs, self.dim = num_docs, dim

    def setup(self) -> None:
        gen = SyntheticDataGenerator()
        self.embeddings = gen.embeddings(self.num_docs, self.dim)
        rng = np.random.RandomState(7)
        self.query_vecs = self.embeddings[:32] + 0.05 * rng.randn(
            32, self.dim
        ).astype(np.float32)

    def run(self) -> List[BenchmarkResult]:
        import jax.numpy as jnp

        from osr_tpu.ops import quantize as qz

        out: List[BenchmarkResult] = []
        emb = jnp.asarray(self.embeddings)

        for method in ("symmetric", "asymmetric"):
            t0 = time.perf_counter()
            if method == "symmetric":
                values, scales = qz.quantize_symmetric(emb)
                recon = np.asarray(qz.dequantize_symmetric(values, scales))
            else:
                values, scales, mins = qz.quantize_asymmetric(emb)
                recon = np.asarray(
                    qz.dequantize_asymmetric(values, scales, mins)
                )
            check = CorrectnessValidator.validate_quantization(
                self.embeddings, recon, min_cosine=0.95
            )
            check["compression_x"] = (
                self.embeddings.nbytes
                / (np.asarray(values).nbytes + np.asarray(scales).nbytes)
            )
            out.append(
                BenchmarkResult(
                    name=f"quantize_{method}_quality",
                    passed=check["passed"],
                    duration_s=time.perf_counter() - t0,
                    metrics=check,
                )
            )

        # Retrieval-quality preservation (int8 vs fp32 P@10 overlap).
        t0 = time.perf_counter()
        q = jnp.asarray(self.query_vecs)
        d8, ds = qz.quantize_symmetric(emb)
        _, i8 = qz.int8_search_symmetric(q, d8, ds, k=10)
        _, ifp = qz.fp_search(q, emb, k=10)
        i8, ifp = np.asarray(i8), np.asarray(ifp)
        overlaps = [
            len(set(i8[b]) & set(ifp[b])) / 10 for b in range(len(i8))
        ]
        p_at_10 = float(np.mean(overlaps))
        out.append(
            BenchmarkResult(
                name="int8_retrieval_preservation",
                passed=p_at_10 >= 0.85,  # reference measured 0.936
                duration_s=time.perf_counter() - t0,
                metrics={"p_at_10_overlap": p_at_10},
            )
        )

        # int8 vs fp32 similarity speed (reference's int8 was 0.19x on CPU;
        # on the MXU int8 should at least match fp32).
        import jax

        def time_fn(fn):
            jax.block_until_ready(fn())
            t0 = time.perf_counter()
            for _ in range(3):
                jax.block_until_ready(fn())
            return (time.perf_counter() - t0) / 3

        q8, qs = qz.quantize_symmetric(q)
        int8_t = time_fn(lambda: qz.int8_dot_product_batch(q8, d8, qs, ds))
        fp_t = time_fn(
            lambda: jnp.dot(q, emb.T, preferred_element_type=jnp.float32)
        )
        speedup = fp_t / int8_t if int8_t else float("inf")
        out.append(
            BenchmarkResult(
                name="int8_matmul_speed",
                passed=True,
                duration_s=int8_t + fp_t,
                metrics={"int8_s": int8_t, "fp32_s": fp_t, "speedup": speedup},
                grade=grade_performance(speedup, 1.0),
            )
        )
        return out


REAL_PROSE_FILES = (
    "/root/reference/README.md",
    "/root/reference/DEVELOPMENT.md",
    "/root/reference/PROJECT_STATUS.md",
    "/root/reference/REPRO.md",
    "/root/reference/report/rag_pipeline_report.md",
    "/root/reference/report/week1.md",
)


def real_prose_paragraphs() -> List[str]:
    """Paragraphs of real English prose available offline (the reference
    repo's markdown). Empty list when not mounted — callers fall back to
    synthetic. Real text is where the compressed store's behavior differs
    from synthetic Zipf words (which compress ~1.0x; reference measured
    0.993x on its synthetic data, test_results/memory_mapping_results)."""
    paras: List[str] = []
    for f in REAL_PROSE_FILES:
        p = Path(f)
        if p.exists():
            paras.extend(
                c.strip()
                for c in p.read_text(encoding="utf-8").split("\n\n")
                if len(c.strip()) >= 60
            )
    return paras


class StorageSuite(BenchmarkSuite):
    name = "storage"

    def __init__(self, num_docs: int = 2000, text_source: str = "synthetic"):
        if text_source not in ("synthetic", "real"):
            raise ValueError(f"Unknown text_source: {text_source}")
        self.num_docs = num_docs
        self.text_source = text_source
        self._tmp: Optional[tempfile.TemporaryDirectory] = None

    def setup(self) -> None:
        from osr_tpu.storage.documents import Document

        self._tmp = tempfile.TemporaryDirectory()
        rng = np.random.RandomState(42)
        if self.text_source == "real":
            paras = real_prose_paragraphs()
            if not paras:
                raise RuntimeError(
                    "text_source='real' needs the reference prose mounted"
                )
            # Sample 1-4 paragraphs per document: realistic lengths and
            # genuinely compressible English text (the reference's real-
            # data runs used FiQA/NQ, unavailable offline).
            self.docs = [
                Document(
                    id=f"d{i}",
                    text="\n\n".join(
                        paras[j]
                        for j in rng.randint(
                            0, len(paras), int(rng.randint(1, 5))
                        )
                    ),
                    title=f"Title {i}",
                )
                for i in range(self.num_docs)
            ]
        else:
            words = [f"word{i}" for i in range(500)]
            self.docs = [
                Document(
                    id=f"d{i}",
                    text=" ".join(
                        words[j]
                        for j in rng.randint(
                            0, 500, max(10, int(rng.gamma(2, 60)))
                        )
                    ),
                    title=f"Title {i}",
                )
                for i in range(self.num_docs)
            ]
        self.path = Path(self._tmp.name) / "bench.osrd"

    def cleanup(self) -> None:
        if self._tmp is not None:
            self._tmp.cleanup()

    def run(self) -> List[BenchmarkResult]:
        from osr_tpu.storage.doc_store import DocumentStore

        out: List[BenchmarkResult] = []

        t0 = time.perf_counter()
        store = DocumentStore(self.path, create=True)
        store.add_documents(self.docs)
        build_t = time.perf_counter() - t0
        stats = store.get_stats()
        out.append(
            BenchmarkResult(
                name="build",
                passed=stats["num_documents"] == self.num_docs,
                duration_s=build_t,
                metrics={
                    "docs_per_s": self.num_docs / build_t if build_t else 0.0,
                    "compression_ratio": stats["compression_ratio"],
                    "file_mb": stats["file_bytes"] / 2**20,
                },
            )
        )

        rng = np.random.RandomState(0)
        ids = [f"d{i}" for i in rng.randint(0, self.num_docs, 500)]
        t0 = time.perf_counter()
        docs = store.get_documents(ids, num_workers=1)
        rand_t = time.perf_counter() - t0
        out.append(
            BenchmarkResult(
                name="random_access",
                passed=all(d is not None for d in docs),
                duration_s=rand_t,
                metrics={
                    "reads_per_s": len(ids) / rand_t if rand_t else 0.0,
                    "cache_hit_rate": store.cache.stats()["hit_rate"],
                },
            )
        )

        t0 = time.perf_counter()
        count = sum(1 for _ in store.iter_documents())
        seq_t = time.perf_counter() - t0
        out.append(
            BenchmarkResult(
                name="sequential_scan",
                passed=count == self.num_docs,
                duration_s=seq_t,
                metrics={"docs_per_s": count / seq_t if seq_t else 0.0},
            )
        )

        store.close()
        t0 = time.perf_counter()
        store2 = DocumentStore(self.path)
        first = store2.get_document("d0")
        cold_t = time.perf_counter() - t0
        store2.close()
        out.append(
            BenchmarkResult(
                name="cold_start",
                passed=first is not None,
                duration_s=cold_t,
                metrics={"open_plus_first_read_ms": cold_t * 1000},
            )
        )
        return out


ALL_SUITES = {
    "bm25": BM25Suite,
    "topk": TopKSuite,
    "quantization": QuantizationSuite,
    "storage": StorageSuite,
}
