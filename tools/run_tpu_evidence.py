#!/usr/bin/env python3
"""Run the round-4 real-chip evidence queue, cheapest first.

The TPU tunnel is intermittent; when it comes back this banks every
pending measurement in value-per-minute order so a mid-queue outage
still leaves committed evidence. Each step runs as a subprocess with
its own timeout and its stdout/stderr teed to
bench_results/tpu_evidence_<step>.log; a failing or timing-out step is
recorded and the queue continues.

Queue (VERDICT r3 items in parentheses):
  1. probe          — jax.devices() sanity (fast-fail if tunnel is down)
  2. narrow         — tools/profile_narrow.py (item 8: narrowed selection)
  3. hybrid         — tools/bench_hybrid.py (item 2: fast-path QPS)
  4. sharded        — tools/bench_sharded_tpu.py (item 6)
  5. encoder        — tools/bench_dense_encoder.py (item 4: TPU forward)
  5b. quality(+_sampled) — bench_quality_at_scale on-chip QPS (item 1)
  6. warm1m         — bench_scaling 1M int8 warm rerun with the
                      upload/compile warmup decomposition (item 5)
  7. scale5m        — bench_scaling 5M int4 F=4096 (item 7)
  8. scale10m       — bench_scaling 10M int4 F=1024 chunked (item 3)
  (+ dense_scale    — 1M-doc dense int8/int4 QPS via from_quantized)

Usage: python tools/run_tpu_evidence.py [--only step1,step2] [--skip ...]
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).parents[1]
LOGDIR = ROOT / "bench_results"
PY = sys.executable

def _load_if_dumped(name):
    d = ROOT / ".scaling_dumps" / name
    return ["--load-index", str(d)] if (d / "meta.json").exists() else []


QUEUE = [
    # (name, timeout_s, argv)
    ("probe", 300, [PY, "-c",
                    "import jax; d = jax.devices()[0]; "
                    "assert d.platform == 'tpu', d; print(d)"]),
    ("narrow", 2400, [PY, "tools/profile_narrow.py"]),
    # The headline bench itself: banks this session's host-path
    # improvements (vectorized result assembly) as a logged JSON line
    # even if the driver's own round-end run misses the tunnel window.
    ("headline", 3600, [PY, "bench.py"]),
    ("hybrid", 2400, [PY, "tools/bench_hybrid.py"]),
    # Rank-based fusion variant: same legs, rrf scoring (fusion cost is
    # one extra argsort per batch — expect QPS within noise of weighted).
    ("hybrid_rrf", 2400, [PY, "tools/bench_hybrid.py", "--fusion", "rrf"]),
    ("sharded", 3000, [PY, "tools/bench_sharded_tpu.py"]),
    # Extract-mode sharded row: per-shard Mosaic top-m extraction +
    # host-side candidate head scores (the score matrix never in HBM).
    ("sharded_x", 3000, [PY, "tools/bench_sharded_tpu.py",
                         "--narrow-m", "8",
                         "--narrow-backend", "extract"]),
    ("encoder", 3000, [PY, "tools/bench_dense_encoder.py"]),
    # Re-emit the at-scale quality artifact with on-chip QPS (VERDICT r3
    # item 1 asked for "QPS on the real chip" in quality_real_text.json;
    # the committed runs were made during the tunnel outage on CPU).
    ("quality", 3600, [PY, "tools/bench_quality_at_scale.py",
                       "--dense-hashing"]),
    ("quality_noisy", 3600, [PY, "tools/bench_quality_at_scale.py",
                             "--query-mode", "noisy", "--f32-control",
                             "--dense-hashing"]),
    ("dense_scale", 3600, [PY, "tools/bench_dense_scale.py",
                           "--docs", "1000000"]),
    ("warm1m", 3600, [PY, "tools/bench_scaling.py", "--docs", "1000000",
                      "--head-dtype", "int8", "--note", "warm-decomposed"]),
    # Narrowed per-chunk exact selection at 1M docs (the chunked path's
    # R-proportional final-top-k shrinks k*128 -> k*m candidates/chunk).
    ("narrow1m", 3600, [PY, "tools/bench_scaling.py", "--docs", "1000000",
                        "--head-dtype", "int8", "--narrow-m", "8",
                        "--note", "narrowed-selection-1M"]),
    # Chunked-extract at 1M docs: the per-chunk (B, Rc) score write —
    # ~8 GB of HBM traffic per pass at B=2048 — never happens.
    ("extract1m", 3600, [PY, "tools/bench_scaling.py", "--docs", "1000000",
                         "--head-dtype", "int8", "--narrow-m", "8",
                         "--narrow-backend", "extract",
                         "--note", "chunked-extract-1M"]),
    # 5M x F=4096 int4 head = 9.54 GiB HBM. r4 MEASURED the boundary:
    # an explicit 500k-row chunk (4.1 GiB at B=2048) on top of that
    # head RESOURCE_EXHAUSTED (13.6 GiB fails / 11.0 GiB fits —
    # tpu_evidence_scale5m.log), so chunk sizing is now left to the
    # engine's head-residency-aware auto-chunker (~320k rows here).
    # _load_or_build: /tmp/prebuild_indexes.sh dumps these indexes to
    # .scaling_dumps/ during tunnel outages so the TPU window is spent
    # measuring, not rebuilding (~10-40 min of 1-core host build each).
    ("scale5m", 7200, lambda: [PY, "tools/bench_scaling.py",
                               "--docs", "5000000",
                               "--head-dtype", "int4", "--head-cap", "4096",
                               "--head-budget-gib", "11",
                               "--note", "head-width-cure-at-5M-autochunk"]
                      + _load_if_dumped("5m_int4_f4096")),
    ("scale10m", 10800, lambda: [PY, "tools/bench_scaling.py",
                                 "--docs", "10000000",
                                 "--head-dtype", "int4",
                                 "--head-cap", "1024",
                                 "--score-chunk-rows", "500000",
                                 "--note", "10M-one-chip"]
                        + _load_if_dumped("10m_int4_f1024")),
    # Least marginal value last: the sampled regime's CPU deltas are
    # already committed; this only refreshes its QPS on-chip.
    ("quality_sampled", 3600, [PY, "tools/bench_quality_at_scale.py",
                               "--query-mode", "sample"]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))
    skip = set(filter(None, args.skip.split(",")))

    results = {}
    for name, tmo, argv in QUEUE:
        if (only and name not in only) or name in skip:
            continue
        if callable(argv):  # resolved at run time (e.g. dump presence)
            argv = argv()
        log = LOGDIR / f"tpu_evidence_{name}.log"
        print(f"== {name} (timeout {tmo}s) -> {log}", flush=True)
        t0 = time.time()
        with open(log, "w") as fh:
            try:
                rc = subprocess.run(
                    argv, cwd=ROOT, stdout=fh, stderr=subprocess.STDOUT,
                    timeout=tmo,
                ).returncode
            except subprocess.TimeoutExpired:
                rc = "timeout"
        dt = round(time.time() - t0, 1)
        results[name] = {"rc": rc, "s": dt}
        print(f"   {name}: rc={rc} in {dt}s", flush=True)
        if name == "probe" and rc != 0:
            print("tunnel down; aborting queue", flush=True)
            break
    print(json.dumps(results))


if __name__ == "__main__":
    main()
