#!/usr/bin/env python
"""Render-stage knob sweep at the shipping config (round 5).

Times ONLY render_tiles_v3 (+assemble) at the 5.8M/1080p headline over
knob variants: batch_u, slab_u, obig. In-jit fori_loop timing per bench_v3
rules; one compile per variant (persistent cache makes re-runs cheap).

Usage: python benchmarks/render_knobs.py [variant ...]
Variants: bu1 bu2 bu4 slab2 ob64 ob192 ob256 (default: all)
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
    from godotgaussiansplatting_tpu.models.splats import fast_cloud_view
    from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
    from godotgaussiansplatting_tpu.ops.projection_pallas import project_words
    from godotgaussiansplatting_tpu.ops.blocks2 import build_block_frame2_words
    from godotgaussiansplatting_tpu.ops.bigbin import bin_bigs
    from godotgaussiansplatting_tpu.ops.binning2 import bin_blocks2
    from godotgaussiansplatting_tpu.ops.render_pallas3 import (
        assemble_image_v3, render_tiles_v3)

    n = 5_800_000
    cfg = gs.RasterizerConfig(width=1920, height=1080).fast_defaults()
    variants = sys.argv[1:] or ["bu2", "bu1", "bu4", "slab2",
                                "ob64", "ob192", "ob256"]

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
    print("scene staged", flush=True)

    def run_variant(tag):
        kcfg, obig, bu, su = cfg, 128, None, None
        if tag.startswith("bu"):
            bu = int(tag[2:])
            if bu >= 4:
                kcfg = cfg.replace(kernel_vmem_mb=100)
        elif tag.startswith("slab"):
            su = int(tag[4:])
        elif tag.startswith("ob"):
            obig = int(tag[2:])
        tbg = jax.jit(lambda b: bin_bigs(b, kcfg, obig=obig))(bigs)
        tbg = jax.block_until_ready(tbg)

        def make(K):
            @jax.jit
            def run(op):
                payload, bn, bg = op

                def body(i, acc):
                    tiles = render_tiles_v3(
                        payload, bn, bg,
                        jnp.float32(0.0) + i.astype(jnp.float32) * 1e-12,
                        kcfg, batch_u=bu, slab_u=su)
                    img, _ = assemble_image_v3(tiles, kcfg)
                    return acc + img[::256, ::256, 0].sum()
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
            return run
        t0 = time.perf_counter()
        tr = measure(make, (bf.payload, bins, tbg), k_hi=5)
        print(f"{tag:8s}: {tr*1e3:7.2f} ms  [{time.perf_counter()-t0:.0f}s]",
              flush=True)

    for tag in variants:
        try:
            run_variant(tag)
        except Exception as e:
            print(f"{tag:8s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
