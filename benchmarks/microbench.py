#!/usr/bin/env python
"""Primitive-rate microbenchmarks on the real TPU (in-jit loops).

Calibrates the data-movement rates the fast pipeline's design trades on
(README 'Architecture' cites these): row-sort cost per operand, flat global
gather, per-row take_along_axis, and row-gather of payload rows. Used to
steer the binning v3 redesign (round-3).
"""

import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    def measure(fn, *args, k=9):
        f1 = jax.jit(lambda *a: jax.lax.fori_loop(
            0, 1, lambda i, acc: acc + fn(i, *a), jnp.float32(0)))
        fk = jax.jit(lambda *a: jax.lax.fori_loop(
            0, k, lambda i, acc: acc + fn(i, *a), jnp.float32(0)))
        np.asarray(f1(*args)); np.asarray(fk(*args))
        t1s, tks = [], []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f1(*args))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(fk(*args))
            tks.append(time.perf_counter() - t0)
        return (min(tks) - min(t1s)) / (k - 1)

    rng = np.random.default_rng(0)

    # --- row sort, varying operand count (the binning L1/L2 shape) ---------
    NS, B = 135, 46080
    key = jnp.asarray(rng.integers(0, 2**31, (NS, B), dtype=np.int64)
                      .astype(np.uint32))
    ops = [jnp.asarray(rng.integers(0, 2**31, (NS, B), dtype=np.int64)
                       .astype(np.uint32)) for _ in range(3)]
    for nop in (1, 2, 4):
        def srt(i, key, *ops, nop=nop):
            parts = (key + i.astype(jnp.uint32),) + ops[:nop - 1]
            out = jax.lax.sort(parts, dimension=1, num_keys=1,
                               is_stable=True)
            out = out if isinstance(out, tuple) else (out,)
            return out[0][0, 0].astype(jnp.float32)
        t = measure(srt, key, *ops)
        print(f"row sort (135,46080) x{nop} ops: {t*1e3:7.2f} ms "
              f"({NS*B/max(t,1e-9)/1e9:.2f} Gkeys/s)", flush=True)

    # L2 shape: (135, 64, 2048)
    key3 = jnp.asarray(rng.integers(0, 2**31, (135, 64, 2048),
                                    dtype=np.int64).astype(np.uint32))
    ops3 = [jnp.asarray(rng.integers(0, 2**31, (135, 64, 2048),
                                     dtype=np.int64).astype(np.uint32))
            for _ in range(2)]
    for nop in (1, 3):
        def srt3(i, key3, *ops3, nop=nop):
            parts = (key3 + i.astype(jnp.uint32),) + ops3[:nop - 1]
            out = jax.lax.sort(parts, dimension=2, num_keys=1,
                               is_stable=True)
            out = out if isinstance(out, tuple) else (out,)
            return out[0][0, 0, 0].astype(jnp.float32)
        t = measure(srt3, key3, *ops3)
        n = 135 * 64 * 2048
        print(f"row sort (135,64,2048) x{nop} ops: {t*1e3:7.2f} ms "
              f"({n/max(t,1e-9)/1e9:.2f} Gkeys/s)", flush=True)

    # --- gathers ------------------------------------------------------------
    src = jnp.asarray(rng.integers(0, 2**31, (1 << 22,), dtype=np.int64)
                      .astype(np.uint32))
    idx2m = jnp.asarray(rng.integers(0, 1 << 22, (2_097_152,),
                                     dtype=np.int64).astype(np.int32))

    def flat_gather(i, src, idx):
        return src[(idx + i) & ((1 << 22) - 1)].sum().astype(jnp.float32)
    t = measure(flat_gather, src, idx2m)
    print(f"flat gather 2M from 4M u32: {t*1e3:7.2f} ms "
          f"({2.1e6/max(t,1e-9)/1e9:.2f} Gelem/s)", flush=True)

    # per-row take_along_axis (NS, C1) -> (NS, 64*C2)
    src_r = jnp.asarray(rng.integers(0, 2**31, (135, 2048), dtype=np.int64)
                        .astype(np.uint32))
    idx_r = jnp.asarray(rng.integers(0, 2048, (135, 64 * 256),
                                     dtype=np.int64).astype(np.int32))

    def row_take(i, s, ix):
        return jnp.take_along_axis(
            s, (ix + i) % 2048, axis=1).sum().astype(jnp.float32)
    t = measure(row_take, src_r, idx_r)
    n = 135 * 64 * 256
    print(f"take_along (135,2048)->(135,16384): {t*1e3:7.2f} ms "
          f"({n/max(t,1e-9)/1e9:.2f} Gelem/s)", flush=True)

    # row gather: (40960, 16) rows by 1M indices (the bigbin table gather)
    tbl = jnp.asarray(rng.normal(size=(40960, 16)).astype(np.float32))
    idx_t = jnp.asarray(rng.integers(0, 40960, (1_044_480,),
                                     dtype=np.int64).astype(np.int32))

    def row_gather(i, tbl, ix):
        return tbl[(ix + i) % 40960].sum()
    t = measure(row_gather, tbl, idx_t)
    print(f"row gather 1M x 16f32 rows: {t*1e3:7.2f} ms "
          f"({1.04e6*16/max(t,1e-9)/1e9:.2f} Gelem/s)", flush=True)

    # transposed variant: (16, 40960) gather along lanes
    tblT = jnp.asarray(rng.normal(size=(16, 40960)).astype(np.float32))

    def lane_gather(i, tblT, ix):
        return tblT[:, (ix + i) % 40960].sum()
    t = measure(lane_gather, tblT, idx_t)
    print(f"lane gather (16,40960)[:,1M]: {t*1e3:7.2f} ms "
          f"({1.04e6*16/max(t,1e-9)/1e9:.2f} Gelem/s)", flush=True)


if __name__ == "__main__":
    main()
