#!/usr/bin/env python
"""Exact-pipeline attribution at the 5.8M/1080p headline (round-5 item #4:
44.8 s/frame at the oracle config must drop to < 2 s).

Times each exact stage separately with in-jit fori_loops (bench_v3 rules),
at BOTH the shipping exact config (max_tiles_per_splat=32 + giant dense
path) and the oracle config (ORACLE_TILE_CAP), plus isolated micro-probes:
the dense key-matrix build, the global sort at several K, and render_tiles.

Usage: python benchmarks/exact_profile.py [n_splats] [max_t ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_v3 import get_cloud, measure  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
    from godotgaussiansplatting_tpu.ops.projection import project_splats
    from godotgaussiansplatting_tpu.ops.sort import (emit_and_sort,
                                                     tile_boundaries)
    from godotgaussiansplatting_tpu.ops.render import render_tiles

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_800_000
    max_ts = [int(a) for a in sys.argv[2:]] or [32, 128]
    cloud = get_cloud(n)
    base = gs.RasterizerConfig(width=1920, height=1080)
    uni = make_uniforms(gs.orbit_trajectory(1, radius=5.0,
                                            target=(0, 0, 6.0))[0], base)

    # --- stage 1 output (shared) --------------------------------------------
    cfg0 = base
    prj = jax.jit(lambda c, u: project_splats(
        c.means, c.cov3d, c.opacity, c.sh, c.upload_time,
        u.view, u.proj, u.camera_pos, u.model_scale, u.time, cfg0))(cloud, uni)
    nt = np.asarray(prj.num_tiles)
    va = np.asarray(prj.valid)
    print(f"valid {va.sum()/1e6:.2f}M | pairs {nt[va].sum()/1e6:.1f}M | "
          f"nt>8 {(nt[va]>8).sum()/1e3:.0f}K, nt>32 {(nt[va]>32).sum()/1e3:.0f}K, "
          f"nt>128 {(nt[va]>128).sum()/1e3:.0f}K, nt>512 {(nt[va]>512).sum()}, "
          f"max nt {nt[va].max()}", flush=True)

    def loop(fn, probe):
        def make(K):
            @jax.jit
            def run(op):
                def body(i, acc):
                    return acc + probe(fn(i, op))
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
            return run
        return make

    # --- sort micro: lax.sort_key_val at several sizes ----------------------
    for km in (58_000_000, 187_000_000):
        keys = jnp.arange(km, dtype=jnp.uint32)[::-1]
        vals = jnp.arange(km, dtype=jnp.int32)

        def st(i, op):
            k, v = op
            return jax.lax.sort_key_val(k ^ i.astype(jnp.uint32), v,
                                        is_stable=True)
        tr = measure(loop(st, lambda o: o[1][0].astype(jnp.float32)),
                     (keys, vals), k_hi=3)
        print(f"sort_key_val {km/1e6:.0f}M: {tr*1e3:8.1f} ms "
              f"({km/tr/1e9:.2f} Gkeys/s)", flush=True)
        del keys, vals

    # --- emit_and_sort + boundaries + render at each max_t ------------------
    for mt in max_ts:
        cfg = base.replace(max_tiles_per_splat=mt)

        def es(i, p):
            d = (p.depth16 + i.astype(jnp.uint32)) & 0xFFFF
            return emit_and_sort(p.valid, p.rect, p.num_tiles, d, cfg)
        t_es = measure(loop(
            es, lambda s: s.num_pairs.astype(jnp.float32)), prj, k_hi=3)
        print(f"emit_and_sort mt={mt:4d}: {t_es*1e3:8.1f} ms", flush=True)

        pairs = jax.jit(lambda p: emit_and_sort(
            p.valid, p.rect, p.num_tiles, p.depth16, cfg))(prj)
        print(f"  pairs={int(pairs.num_pairs)/1e6:.1f}M "
              f"overflow={int(pairs.num_overflow)}", flush=True)

        def tb(i, op):
            k, npair = op
            return tile_boundaries(k, npair + (i - i), cfg)
        t_tb = measure(loop(tb, lambda se: se[0][0].astype(jnp.float32)),
                       (pairs.keys, pairs.num_pairs), k_hi=3)
        print(f"boundaries   mt={mt:4d}: {t_tb*1e3:8.1f} ms", flush=True)

        start, end = jax.jit(lambda k, np_: tile_boundaries(k, np_, cfg))(
            pairs.keys, pairs.num_pairs)

        for tc in (2048, 4096):
            def rt(i, op):
                vals, s, e, p = op
                return render_tiles(
                    vals, s, e, p.image_pos, p.conic, p.color,
                    jnp.float32(0.0) + i.astype(jnp.float32) * 1e-12, cfg,
                    tile_capacity=tc)
            t_rt = measure(loop(
                rt, lambda o: o.image[::256, ::256, 0].sum()),
                (pairs.values, start, end, prj), k_hi=3)
            print(f"render_tiles tc={tc}: {t_rt*1e3:8.1f} ms", flush=True)
        del pairs, start, end


if __name__ == "__main__":
    main()
