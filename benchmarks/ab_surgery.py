#!/usr/bin/env python
"""Controlled A/B of the round-5 render-kernel surgery: alternates the
baseline (git-HEAD copy, ops/_render_pallas3_base.py) and the surgical
kernel in ONE process so tunnel/thermal variance cancels.

Usage: python benchmarks/ab_surgery.py [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_v3 import get_cloud, measure  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.models.splats import fast_cloud_view
    from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
    from godotgaussiansplatting_tpu.ops.projection_pallas import project_words
    from godotgaussiansplatting_tpu.ops.blocks2 import build_block_frame2_words
    from godotgaussiansplatting_tpu.ops.bigbin import bin_bigs
    from godotgaussiansplatting_tpu.ops.binning2 import bin_blocks2
    from godotgaussiansplatting_tpu.ops import render_pallas3 as surg
    from godotgaussiansplatting_tpu.ops import _render_pallas3_base as base

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n = 5_800_000
    cfg = gs.RasterizerConfig(width=1920, height=1080).fast_defaults()

    cloud = fast_cloud_view(get_cloud(n), planar_sh=True)
    uni = make_uniforms(gs.orbit_trajectory(1, radius=5.0,
                                            target=(0, 0, 6.0))[0], cfg)
    words = jax.jit(lambda c, u: project_words(
        c.means, c.cov3d, c.opacity, c.sh, c.upload_time,
        u.view, u.proj, u.camera_pos, u.model_scale, u.time, cfg,
        num_splats=n))(cloud, uni)
    words = jax.block_until_ready(words)
    bf, bigs = jax.jit(lambda p: build_block_frame2_words(p, cfg))(words)
    bins = jax.jit(lambda b: bin_blocks2(b, cfg))(bf)
    tbg = jax.jit(lambda b: bin_bigs(b, cfg, obig=128))(bigs)
    tbg = jax.block_until_ready(tbg)
    print("scene staged", flush=True)

    import numpy as np

    def run_mod(mod, tag):
        def make(K):
            @jax.jit
            def run(op):
                payload, bn, bg = op

                def body(i, acc):
                    tiles = mod.render_tiles_v3(
                        payload, bn, bg,
                        jnp.float32(0.0) + i.astype(jnp.float32) * 1e-12,
                        cfg)
                    img, _ = mod.assemble_image_v3(tiles, cfg)
                    return acc + img[::256, ::256, 0].sum()
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
            return run
        t0 = time.perf_counter()
        tr = measure(make, (bf.payload, bins, tbg), k_hi=5)
        print(f"{tag:8s}: {tr*1e3:7.2f} ms  [{time.perf_counter()-t0:.0f}s]",
              flush=True)
        return tr * 1e3

    # bit-equality probe first (surgery must be semantics-preserving)
    ib = jax.jit(lambda p, bn, bg: base.assemble_image_v3(
        base.render_tiles_v3(p, bn, bg, jnp.float32(0.0), cfg), cfg)[0])(
            bf.payload, bins, tbg)
    isg = jax.jit(lambda p, bn, bg: surg.assemble_image_v3(
        surg.render_tiles_v3(p, bn, bg, jnp.float32(0.0), cfg), cfg)[0])(
            bf.payload, bins, tbg)
    a, b = np.asarray(ib), np.asarray(isg)
    eq = np.array_equal(a, b)
    mx = float(np.abs(a - b).max()) if not eq else 0.0
    print(f"bit-equal: {eq} (max abs diff {mx:g})", flush=True)

    bs, ss = [], []
    for r in range(rounds):
        bs.append(run_mod(base, f"base#{r}"))
        ss.append(run_mod(surg, f"surg#{r}"))
    print(f"base median {np.median(bs):.2f} ms | "
          f"surg median {np.median(ss):.2f} ms | "
          f"delta {np.median(ss)-np.median(bs):+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
