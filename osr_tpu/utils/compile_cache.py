"""Persistent XLA compilation cache — one cold compile per machine.

The reference caches built *indices* (.rag_cache npz, reference
rag_system/pipeline/evaluate_rag_pipeline.py:280-312) but has nothing to
cache for code: Numba recompiles its kernels every process start. On TPU
the analogous (and much larger) cost is XLA compilation: at 1-2M docs the
fused search program takes minutes to compile through the remote-compile
tunnel (measured 281-1,001 s cold at 2M docs, bench_results/scaling.jsonl),
and that cost was historically paid by *every* process.

JAX's persistent compilation cache serializes compiled executables keyed by
(HLO, compile options, platform version). Measured on this host's v5e via
the axon plugin: a second process re-running the same program loads the
executable from disk instead of recompiling (e.g. 1.8 s -> 0.44 s for a toy
program; at-scale numbers live in bench_results/scaling.jsonl `warmup_s`
warm rows).

Engines call :func:`enable_persistent_cache` at construction so every user
of the library gets warm starts without knowing the knob exists. Disable
with ``OSR_TPU_COMPILE_CACHE=off`` (or point it elsewhere with a path).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "osr_tpu",
    "jax_cache",
)

_enabled_dir: Optional[str] = None


def enable_persistent_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a stable directory.

    Idempotent; respects an explicit ``jax_compilation_cache_dir`` already
    set by the caller (returns that dir untouched). Returns the active
    cache dir, or None when disabled via ``OSR_TPU_COMPILE_CACHE=off``.
    """
    global _enabled_dir
    import jax

    env = os.environ.get("OSR_TPU_COMPILE_CACHE")
    if env is not None and env.lower() in ("off", "0", "none", ""):
        return None

    current = jax.config.jax_compilation_cache_dir
    if current:
        _enabled_dir = current
        return current
    if _enabled_dir is not None:
        return _enabled_dir

    # Default-on only for accelerator backends: the cache exists to
    # amortize the remote-compile tunnel (minutes at 1M+ docs), while
    # CPU compiles are local and fast — and reloading CPU AOT
    # executables across feature-set changes draws an XLA
    # "may SIGILL" warning. An explicit path (arg or env) overrides.
    if path is None and not env:
        try:
            if jax.default_backend() == "cpu":
                return None
        except Exception as exc:  # pragma: no cover - backend init failure
            # Fall THROUGH and enable: a backend-init hiccup is most
            # likely a transient accelerator-plugin discovery failure on
            # a real TPU host — exactly where the cache saves minutes of
            # remote compile. Worst case (actually CPU) is the benign
            # SIGILL-on-feature-change warning the gate exists to avoid.
            logger.warning(
                "backend probe failed (%s); enabling the persistent "
                "compile cache anyway — accelerator hosts are where it "
                "matters",
                exc,
            )

    cache_dir = path or env or _DEFAULT_DIR
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Small programs are cheap to recompile but numerous; 1 s keeps the
        # cache focused on the expensive at-scale search programs while
        # still catching every compile that users actually feel.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # pragma: no cover - depends on jax version
        logger.warning("persistent compilation cache unavailable: %s", exc)
        return None
    _enabled_dir = cache_dir
    logger.info("persistent compilation cache: %s", cache_dir)
    return cache_dir
