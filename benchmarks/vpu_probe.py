#!/usr/bin/env python
"""VPU rate probe: f32 vs bf16 elementwise throughput, and the real
alpha-eval transcendental chain (fexp + fln_one_minus + fexp), in Pallas
on the attached TPU. Decides whether a bf16 eval path is worth building.
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from godotgaussiansplatting_tpu.ops.render_pallas3 import (
        fexp, fln_one_minus)

    print("device:", jax.devices()[0].device_kind, flush=True)

    R, C = 1024, 512
    STEPS = 64          # grid steps, keeps each kernel ~long enough
    REP = 16            # op-chain repetitions inside the kernel

    def mk(body, dtype):
        def kern(x_ref, o_ref):
            x = x_ref[...]
            acc = jnp.zeros_like(x)
            for r in range(REP):
                acc = acc + body(x + jnp.asarray(r, dtype))
            o_ref[...] = acc

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kern,
                grid=(STEPS,),
                in_specs=[pl.BlockSpec((R, C), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((R, C), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((R, C), dtype),
            )(x)
        return run

    def timeit(tag, run, x, n_elem_ops):
        r = run(x)
        np.asarray(r)            # force
        # time K executions via an in-jit loop around the pallas call
        K = 20
        t0 = time.perf_counter()
        for _ in range(K):
            r = run(x)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / K
        print(f"{tag:28s}: {dt*1e3:7.3f} ms  "
              f"{n_elem_ops/dt/1e9:8.1f} G elem-ops/s", flush=True)
        return dt

    n_el = R * C * STEPS * REP

    # pure mul-add chain (1 fma per rep elementwise); measures raw VPU rate
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.ones((R, C), dtype) * 0.5
        body = lambda v: v * jnp.asarray(1.0001, dtype) + jnp.asarray(
            0.25, dtype)
        timeit(f"fma chain {dtype.__name__}", mk(body, dtype), x, n_el)

    # builtin exp
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.full((R, C), -1.3, dtype)
        timeit(f"jnp.exp {dtype.__name__}", mk(jnp.exp, dtype), x, n_el)

    # fast exp (f32 bit tricks)
    x = jnp.full((R, C), -1.3, jnp.float32)
    timeit("fexp f32", mk(fexp, jnp.float32), x, n_el)

    # the real eval chain: al=min(fexp(P),A); la=fln1m(al); w=fexp(cums)
    def chain_f32(p):
        al = jnp.minimum(fexp(p), 0.99994)
        la = fln_one_minus(al)
        return fexp(la * 0.5) + al

    x = jnp.full((R, C), -1.3, jnp.float32)
    timeit("eval chain f32", mk(chain_f32, jnp.float32), x, n_el)

    # bf16 variant: builtin exp/log1p in bf16 end-to-end
    def chain_bf16(p):
        al = jnp.minimum(jnp.exp(p), jnp.asarray(0.996, jnp.bfloat16))
        la = jnp.log1p(-al)
        return jnp.exp(la * jnp.asarray(0.5, jnp.bfloat16)) + al

    xb = jnp.full((R, C), -1.3, jnp.bfloat16)
    timeit("eval chain bf16 builtin", mk(chain_bf16, jnp.bfloat16), xb, n_el)


if __name__ == "__main__":
    main()
