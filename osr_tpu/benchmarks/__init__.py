from osr_tpu.benchmarks.framework import (
    BenchmarkResult,
    BenchmarkSuite,
    grade_performance,
    run_benchmark_suite,
    generate_report,
)
from osr_tpu.benchmarks.integration import IntegrationRunner

__all__ = [
    "BenchmarkResult",
    "BenchmarkSuite",
    "grade_performance",
    "run_benchmark_suite",
    "generate_report",
    "IntegrationRunner",
]
