#!/usr/bin/env python3
"""Test fixes for the matmul->top_k relayout stall observed at B=6656:
(a) split into two programs, (b) optimization_barrier, (c) chunked scan
with running (B, k) merge. Prints per-variant ms.
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

    B, R, F, K = 6656, 57640, 2048, 50
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device: {dev}", flush=True)

    head = jax.device_put(
        rng.integers(-127, 128, (R, F)).astype(np.int8), dev
    )
    q = jax.device_put(
        (rng.random((B, F)) * 0.01).astype(np.float32), dev
    )
    scales = jax.device_put(
        (rng.random(F).astype(np.float32) + 0.5) / 127.0, dev
    )
    valid = jax.device_put(np.ones(R, dtype=bool), dev)
    jax.block_until_ready([head, q, scales, valid])

    def mm(qf):
        qb = (qf * scales[None, :]).astype(jnp.bfloat16)
        hs = lax.dot_general(
            qb,
            head.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.where(valid[None, :], hs, -jnp.inf)

    # (0) baseline single program
    @jax.jit
    def one(qf):
        s, r = lax.top_k(mm(qf), K)
        return jnp.concatenate([s, r.astype(jnp.float32)], axis=1)

    print(f"one-program (baseline): {timeit(lambda: one(q)) * 1e3:8.2f} ms", flush=True)

    # (a) two programs
    p1 = jax.jit(mm)
    @jax.jit
    def p2(hs):
        s, r = lax.top_k(hs, K)
        return jnp.concatenate([s, r.astype(jnp.float32)], axis=1)

    def two():
        return p2(p1(q))

    print(f"two-program split: {timeit(two) * 1e3:8.2f} ms", flush=True)

    # (b) optimization barrier
    @jax.jit
    def barrier(qf):
        hs = lax.optimization_barrier(mm(qf))
        s, r = lax.top_k(hs, K)
        return jnp.concatenate([s, r.astype(jnp.float32)], axis=1)

    print(f"optimization_barrier: {timeit(lambda: barrier(q)) * 1e3:8.2f} ms", flush=True)

    # (c) chunked scan with running merge
    C = 8192
    nc = -(-R // C)
    Rp = nc * C
    headp = jax.device_put(
        np.pad(np.asarray(head), ((0, Rp - R), (0, 0))), dev
    )
    validp = jax.device_put(
        np.pad(np.asarray(valid), (0, Rp - R)), dev
    )
    head_c = headp.reshape(nc, C, F)
    valid_c = validp.reshape(nc, C)
    jax.block_until_ready([head_c, valid_c])

    @jax.jit
    def scanned(qf):
        qb = (qf * scales[None, :]).astype(jnp.bfloat16)

        def step(carry, xs):
            cs, cr = carry
            hc, vc, base = xs
            hs = lax.dot_general(
                qb,
                hc.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            hs = jnp.where(vc[None, :], hs, -jnp.inf)
            s, r = lax.top_k(hs, K)
            r = r.astype(jnp.int32) + base
            ms, mi = lax.top_k(
                jnp.concatenate([cs, s], axis=1), K
            )
            mr = jnp.take_along_axis(
                jnp.concatenate([cr, r], axis=1), mi, axis=1
            )
            return (ms, mr), None

        init = (
            jnp.full((B, K), -jnp.inf, jnp.float32),
            jnp.zeros((B, K), jnp.int32),
        )
        bases = jnp.arange(nc, dtype=jnp.int32) * C
        (s, r), _ = lax.scan(step, init, (head_c, valid_c, bases))
        return jnp.concatenate([s, r.astype(jnp.float32)], axis=1)

    print(f"chunked scan (C={C}): {timeit(lambda: scanned(q)) * 1e3:8.2f} ms", flush=True)

    # sanity: same results
    a = np.asarray(one(q))
    c = np.asarray(scanned(q))
    same = np.allclose(np.sort(a[:, :K]), np.sort(c[:, :K]), atol=1e-5)
    print(f"scan == baseline scores: {same}", flush=True)


if __name__ == "__main__":
    main()
