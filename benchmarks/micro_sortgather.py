#!/usr/bin/env python
"""Microbench: stage-1 sort strategies at headline scale (354 x 16384).

Compares carrying N payload operands through jax.lax.sort against a
2-operand (key, column) sort followed by ONE packed take_along_axis
gather — the decision input for restructuring ops/blocks2.py.

In-jit fori_loop timing per bench_v3 rules (tunnel dispatch ~25 ms).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_v3 import measure  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    SB, W = 354, 16384
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**31, (SB, W), dtype=np.uint32))
    ops = [jnp.asarray(rng.integers(0, 2**32, (SB, W), dtype=np.uint32))
           for _ in range(7)]
    col = jnp.broadcast_to(jnp.arange(W, dtype=jnp.uint32)[None], (SB, W))
    packed6 = jnp.stack(ops[:6], axis=-1)          # (SB, W, 6)

    def probe(x):
        return x.reshape(-1)[::65536].astype(jnp.float32).sum()

    def loop(body):
        def make(K):
            @jax.jit
            def run(op):
                def b(i, acc):
                    return acc + body(i, op)
                return jax.lax.fori_loop(0, K, b, jnp.float32(0.0))
            return run
        return make

    variants = {}

    def sort8(i, op):
        k, o = op[0] + i, op[1]
        s = jax.lax.sort((k,) + tuple(o), dimension=1, num_keys=1,
                         is_stable=True)
        return sum(probe(x) for x in s[:2])
    variants["sort 8-op (key+7)"] = (sort8, (key, tuple(ops)))

    def sort7(i, op):
        k, o = op[0] + i, op[1]
        s = jax.lax.sort((k,) + tuple(o[:6]), dimension=1, num_keys=1,
                         is_stable=True)
        return sum(probe(x) for x in s[:2])
    variants["sort 7-op (key+6)"] = (sort7, (key, tuple(ops)))

    def sort2(i, op):
        k, c = op[0] + i, op[1]
        s = jax.lax.sort((k, c), dimension=1, num_keys=1, is_stable=True)
        return probe(s[0]) + probe(s[1])
    variants["sort 2-op (key+col)"] = (sort2, (key, col))

    def sort2g(i, op):
        k, c, p6 = op[0] + i, op[1], op[2]
        ks, cs = jax.lax.sort((k, c), dimension=1, num_keys=1,
                              is_stable=True)
        g = jnp.take_along_axis(p6, cs.astype(jnp.int32)[..., None], axis=1)
        return probe(ks) + probe(g)
    variants["sort2 + packed6 gather"] = (sort2g, (key, col, packed6))

    def gather_only(i, op):
        c, p6 = op[1], op[2]
        g = jnp.take_along_axis(
            p6, ((c + i) % W).astype(jnp.int32)[..., None], axis=1)
        return probe(g)
    variants["packed6 gather only"] = (gather_only, (key, col, packed6))

    def gather6sep(i, op):
        c = ((op[1] + i) % W).astype(jnp.int32)
        acc = jnp.float32(0.0)
        for o in op[2]:
            acc += probe(jnp.take_along_axis(o, c, axis=1))
        return acc
    variants["6 separate gathers"] = (gather6sep, (key, col, tuple(ops[:6])))

    for name, (body, operand) in variants.items():
        t0 = time.perf_counter()
        tr = measure(loop(body), operand, k_hi=5)
        wall = time.perf_counter() - t0
        print(f"{name:28s}: {tr*1e3:7.2f} ms  [{wall:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
