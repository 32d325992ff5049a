"""Hardware detection, TPU-first.

The reference detects CPU SIMD flags / core counts / RAM to pick batch
sizes and enable Numba (reference tests/hardware_detection.py,
evaluate_rag_pipeline.py:39-53). The TPU equivalent reports the accelerator
fleet (platform, device kinds, count, HBM) plus host CPU/RAM, and derives
the same adaptive knobs (query batch size, cache enablement) from it.
"""

from __future__ import annotations

import os
from typing import Any, Dict


def detect_hardware_capabilities() -> Dict[str, Any]:
    caps: Dict[str, Any] = {
        "cores": os.cpu_count() or 1,
        "threads": os.cpu_count() or 1,
        "memory_gb": 8,
        "platform": "cpu",
        "num_devices": 0,
        "device_kind": None,
        "hbm_gb": 0.0,
    }
    try:
        import psutil

        caps["cores"] = psutil.cpu_count(logical=False) or caps["cores"]
        caps["threads"] = psutil.cpu_count(logical=True) or caps["threads"]
        caps["memory_gb"] = psutil.virtual_memory().total // 2**30
    except Exception:  # pragma: no cover
        pass
    try:
        import jax

        devices = jax.devices()
        caps["platform"] = devices[0].platform
        caps["num_devices"] = len(devices)
        caps["device_kind"] = devices[0].device_kind
        stats = devices[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit:
            caps["hbm_gb"] = round(limit / 2**30, 1)
    except Exception:  # pragma: no cover - no accelerator
        pass
    return caps


def recommended_batch_size(caps: Dict[str, Any] | None = None) -> int:
    """Adaptive query batch size (the reference scales batches by host RAM,
    evaluate_rag_pipeline.py:322; on TPU the device count matters more)."""
    caps = caps or detect_hardware_capabilities()
    if caps.get("platform") in ("tpu", "axon"):
        return 128 * max(1, caps.get("num_devices", 1))
    return int(min(64, max(8, caps.get("memory_gb", 8) * 2)))


def validate_backend() -> Dict[str, Any]:
    """Sanity-check the numeric backend (the TPU analogue of the reference's
    validate_numpy_simd, reference tests/hardware_detection.py:32-79): run a
    small matmul/reduction on the default device and compare against NumPy."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.RandomState(0)
    a = rng.randn(64, 64).astype(np.float32)
    b = rng.randn(64, 64).astype(np.float32)
    got = np.asarray(
        jnp.dot(jnp.asarray(a), jnp.asarray(b), precision="highest")
    )
    want = a @ b
    max_err = float(np.abs(got - want).max())
    sum_err = float(abs(float(jnp.asarray(a).sum()) - a.sum()))
    ok = max_err < 1e-3 and sum_err < 1e-2
    return {
        "ok": bool(ok),
        "matmul_max_abs_err": max_err,
        "reduction_abs_err": sum_err,
        "platform": detect_hardware_capabilities()["platform"],
    }


def get_optimization_recommendations(
    caps: Dict[str, Any] | None = None,
) -> Dict[str, str]:
    """Human-readable tuning hints (reference
    tests/hardware_detection.py:81-143 capability)."""
    caps = caps or detect_hardware_capabilities()
    recs: Dict[str, str] = {}
    if caps.get("platform") in ("tpu", "axon"):
        recs["scoring"] = (
            "TPU detected: hybrid dense-head layout active; prefer batch "
            f"sizes >= {recommended_batch_size(caps)} to amortize dispatch."
        )
        if caps.get("num_devices", 1) > 1:
            recs["sharding"] = (
                f"{caps['num_devices']} devices: use "
                "osr_tpu.parallel.ShardedSparseSearchEngine to shard the "
                "index over the 'd' mesh axis."
            )
    else:
        recs["scoring"] = (
            "No TPU detected: the XLA CPU backend runs the same kernels; "
            "expect reduced throughput."
        )
    if caps.get("memory_gb", 0) <= 4:
        recs["memory"] = "Low host RAM: disable index caching (cache_matrices=False)."
    return recs
