#!/usr/bin/env python3
"""Run the FULL pipeline surface (config -> registry -> engine -> reader ->
summary artifacts) over the 87k-doc real-prose fixture and commit
reference-schema results (VERDICT r4 #6).

Quality evidence previously came from tools/bench_quality_*.py calling the
benchmark harness directly; this exercises the L6/L7 path end-to-end —
``osr_tpu.pipeline.experiment.run_all_experiments`` over
osr_tpu/configs/prose_87k.yaml — exactly like the reference's committed
``results/*.json`` come from its rag_research_pipeline
(reference rag_system/pipeline/rag_research_pipeline.py:41-103).

The dataset is the at-scale harvest of bench_quality_at_scale.py
(48-word/stride-24 chunks of all offline prose), NOISY query regime
(4 source words + 2 confounder words — the discriminative, off-ceiling
regime). Results land in results/prose_87k/ (committed).

Usage: python tools/run_pipeline_87k.py [--num-queries 512] [--cpu]
"""

import argparse
import importlib.util
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-queries", type=int, default=512)
    ap.add_argument("--max-chunks", type=int, default=100_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from osr_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    # Reuse the at-scale harvest + dataset writer (single source of truth
    # for the fixture's construction).
    spec = importlib.util.spec_from_file_location(
        "bench_quality_at_scale",
        Path(__file__).parent / "bench_quality_at_scale.py",
    )
    at_scale = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(at_scale)

    from osr_tpu.pipeline.config import load_config
    from osr_tpu.pipeline.experiment import run_all_experiments

    t0 = time.perf_counter()
    chunks = at_scale.harvest_chunks(args.max_chunks)
    print(
        f"# harvested {len(chunks)} chunks in {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )
    if len(chunks) < 20_000:
        raise RuntimeError(f"only {len(chunks)} chunks; need >=20k")

    repo = Path(__file__).parents[1]
    cfg = load_config(repo / "osr_tpu" / "configs" / "prose_87k.yaml")
    with tempfile.TemporaryDirectory() as td:
        ds = Path(td) / "prose87k"
        n_queries, grade1 = at_scale.build_dataset(
            ds, chunks, args.num_queries, mode="noisy"
        )
        print(
            f"# dataset: {len(chunks)} docs, {n_queries} queries, "
            f"{grade1} grade-1 qrels",
            file=sys.stderr,
        )
        cfg["datasets_root"] = td
        cfg["output_dir"] = str(repo / "results" / "prose_87k")
        overall = run_all_experiments(cfg)
    ok = sum(1 for v in overall.values() if v.get("status") == "ok")
    print(f"# {ok}/{len(overall)} experiments ok -> {cfg['output_dir']}")
    return 0 if ok == len(overall) else 1


if __name__ == "__main__":
    sys.exit(main())
