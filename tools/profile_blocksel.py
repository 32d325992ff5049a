#!/usr/bin/env python3
"""Exact block-pruned top-k (see DEVELOPMENT.md): per-128 block maxima ->
top-W blocks per query (W >= k guarantees exactness up to score ties) ->
contiguous-lane block gather -> small top-k. Measures each stage and the
whole fused program vs plain lax.top_k.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, reps=4):
    out = fn()
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/osr_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, R, K, W = 6656, 57640, 50, 64
    T = -(-R // 128)
    Rp = T * 128
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev} B={B} R={R} T={T} W={W}", flush=True)
    hs_np = rng.standard_normal((B, Rp), dtype=np.float32) * 5.0
    hs_np[:, R:] = -np.inf
    hs = jax.device_put(hs_np, dev)
    jax.block_until_ready(hs)

    def pack(s, r):
        return jnp.concatenate([s, r.astype(jnp.float32)], axis=1)

    @jax.jit
    def blocksel(x):
        xr = x.reshape(B, T, 128)
        mb = xr.max(axis=2)  # (B, T)
        _, bi = lax.top_k(mb, W)  # (B, W)
        cand = jnp.take_along_axis(xr, bi[:, :, None], axis=1)  # (B, W, 128)
        s, li = lax.top_k(cand.reshape(B, W * 128), K)
        blk = jnp.take_along_axis(bi, li // 128, axis=1)
        rows = blk * 128 + li % 128
        return pack(s, rows)

    t = timeit(lambda: blocksel(hs))
    print(f"block-pruned exact top-k: {t * 1e3:8.2f} ms", flush=True)

    @jax.jit
    def tk(x):
        return pack(*lax.top_k(x, K))

    t2 = timeit(lambda: tk(hs))
    print(f"plain top_k: {t2 * 1e3:8.2f} ms", flush=True)

    # stage: block max only
    @jax.jit
    def bmax(x):
        return x.reshape(B, T, 128).max(axis=2).sum()

    print(f"block max reduce: {timeit(lambda: bmax(hs)) * 1e3:8.2f} ms", flush=True)

    # correctness
    a = np.asarray(tk(hs))
    b = np.asarray(blocksel(hs))
    print("scores equal:", np.array_equal(a[:, :K], b[:, :K]),
          "rows equal:", np.array_equal(a[:, K:], b[:, K:]), flush=True)


if __name__ == "__main__":
    main()
