"""Config-driven benchmark runner.

The YAML-spec'd counterpart of the reference's ``BenchmarkConfig`` /
``BenchmarkRunner`` (reference bench/core/benchmark_runner.py:29-121 —
whose execution body was a TODO; this one runs). A benchmark config
selects suites, their sizes, the RNG seed, thread-count environment
control and the output directory:

    name: nightly
    seed: 42
    num_threads: 1           # OMP/MKL pinning, reference :117-119
    output_dir: test_results
    suites:
      bm25: {num_docs: 500, vocab_size: 1500}
      topk: {n: 50000, batch: 16, k: 100}
      quantization: {}
      storage: {}

``python -m osr_tpu.cli bench --config osr_tpu/configs/benchmarks.yaml``
reproduces the ``test_results/`` tree.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import random
from pathlib import Path
from typing import Any, Dict, Optional, Union

import numpy as np

logger = logging.getLogger(__name__)

from osr_tpu.benchmarks.integration import IntegrationRunner
from osr_tpu.benchmarks.suites import ALL_SUITES


@dataclasses.dataclass
class BenchmarkConfig:
    """Validated benchmark specification (reference
    benchmark_runner.py:29-40 semantics)."""

    name: str = "benchmark"
    seed: int = 42
    num_threads: Optional[int] = None
    output_dir: str = "test_results"
    suites: Dict[str, Dict[str, Any]] = dataclasses.field(
        default_factory=dict
    )

    def validate(self) -> None:
        unknown = set(self.suites) - set(ALL_SUITES)
        if unknown:
            raise ValueError(
                f"Unknown benchmark suites {sorted(unknown)}; "
                f"available: {sorted(ALL_SUITES)}"
            )
        if self.seed < 0:
            raise ValueError("seed must be non-negative")


def config_from_dict(raw: Dict[str, Any]) -> BenchmarkConfig:
    """Validate a raw mapping into a BenchmarkConfig (the single schema —
    integration.py's CLI adapts to this loader too)."""
    known = {f.name for f in dataclasses.fields(BenchmarkConfig)}
    unknown = set(raw) - known
    if unknown:
        raise ValueError(f"Unknown benchmark config keys: {sorted(unknown)}")
    cfg = BenchmarkConfig(**raw)
    cfg.suites = {k: dict(v or {}) for k, v in (cfg.suites or {}).items()}
    cfg.validate()
    return cfg


def load_benchmark_config(path: Union[str, Path]) -> BenchmarkConfig:
    import yaml

    with open(path, "r", encoding="utf-8") as f:
        raw = yaml.safe_load(f) or {}
    return config_from_dict(raw)


def run_from_config(cfg: BenchmarkConfig) -> Dict[str, Any]:
    """Seed, pin threads, run the selected suites, write reports."""
    import contextlib

    limiter = contextlib.nullcontext()
    if cfg.num_threads is not None:
        # Reference benchmark_runner.py:117-119 thread-count control. The
        # env vars only bind pools not yet initialized (NumPy's BLAS reads
        # them at import, which has already happened here); threadpoolctl
        # re-pins live pools when available, otherwise warn that the knob
        # covers subprocesses/JAX only. The limit is held as a context
        # manager for the suite run only, so the cap doesn't silently
        # persist for the rest of the process.
        os.environ["OMP_NUM_THREADS"] = str(cfg.num_threads)
        os.environ["MKL_NUM_THREADS"] = str(cfg.num_threads)
        try:
            import threadpoolctl

            limiter = threadpoolctl.threadpool_limits(
                limits=cfg.num_threads
            )
        except ImportError:
            logger.warning(
                "num_threads=%d: BLAS pools were initialized before this "
                "runner (threadpoolctl not installed); the limit applies "
                "only to pools created after this point",
                cfg.num_threads,
            )
    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    suites = list(cfg.suites.keys()) or None
    runner = IntegrationRunner(
        out_dir=cfg.output_dir,
        suites=suites,
        suite_kwargs=cfg.suites,
    )
    with limiter:
        overall = runner.run()
    overall["config"] = dataclasses.asdict(cfg)
    return overall
