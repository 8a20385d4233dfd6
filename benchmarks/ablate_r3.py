#!/usr/bin/env python
"""Render-kernel ablation sweep (round-3 attribution refresh).

Times render_tiles_v3 at the 5.8M/1080p headline with kernel stages
stripped one at a time (explicit `ablate` static arg), attributing the
frame time to eval / ordering / corrections / big exchange / pend stores /
emission vs fixed skeleton. In-jit fori_loop timing per bench_v3 rules.

Usage: python benchmarks/ablate_r3.py [variant ...]
Variants default to the full attribution set.
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
    from godotgaussiansplatting_tpu.ops.blocks2 import build_block_frame2
    from godotgaussiansplatting_tpu.ops.bigbin import bin_bigs
    from godotgaussiansplatting_tpu.ops.binning2 import bin_blocks2
    if os.environ.get("GS_KERNEL", "v3") == "v4":
        from godotgaussiansplatting_tpu.ops.render_pallas4 import (
            assemble_image_v4 as assemble_image_v3,
            render_tiles_v4 as render_tiles_v3)
    else:
        from godotgaussiansplatting_tpu.ops.render_pallas3 import (
            assemble_image_v3, render_tiles_v3)

    n = 5_800_000
    # attribution runs at the shipping fast config (tile 32, batch_u 2);
    # the jnp projection feeds it (the kernel path is timed in bench_v3)
    cfg = gs.RasterizerConfig(width=1920, height=1080).fast_defaults()
    cfg = cfg.replace(projection_kernel=False)
    variants = sys.argv[1:] or [
        "", "eval", "cums", "corr", "bigx", "pend",
        "eval,cums,corr,bigx,pend,emit",
    ]
    cloud = get_cloud(n)
    uni = make_uniforms(gs.orbit_trajectory(1, radius=5.0,
                                            target=(0, 0, 6.0))[0], cfg)
    prj = jax.jit(
        lambda c, u: project_splats(
            c.means, c.cov3d, c.opacity, c.sh, c.upload_time,
            u.view, u.proj, u.camera_pos, u.model_scale, u.time, cfg),
    )(cloud, uni)
    prj = jax.block_until_ready(prj)
    bf, bigs = jax.jit(
        lambda p: build_block_frame2(p, cfg, num_splats=n))(prj)
    bins = jax.jit(lambda b: bin_blocks2(b, cfg))(bf)
    tbg = jax.jit(lambda b: bin_bigs(b, cfg))(bigs)
    bins = jax.block_until_ready(bins)
    tbg = jax.block_until_ready(tbg)
    print("scene staged", flush=True)

    if os.environ.get("GS_DIAG", "0") == "1":
        from godotgaussiansplatting_tpu.ops.render_pallas3 import (
            tile_channels_v3)
        tiles = jax.jit(lambda p, bn, bg: tile_channels_v3(render_tiles_v3(
            p, bn, bg, jnp.float32(0.0), cfg), cfg))(bf.payload, bins, tbg)
        d = np.asarray(tiles[:, 0, 5:8])   # per-tile: processed, nb, nbig
        print(f"diag: processed blocks {d[:, 0].sum()/1e3:.0f}K of "
              f"{d[:, 1].sum()/1e3:.0f}K binned "
              f"({d[:, 0].sum()/max(d[:, 1].sum(), 1)*100:.0f}%), "
              f"batches {np.ceil(d[:, 0]/4).sum()/1e3:.0f}K, "
              f"tiles with big {np.mean(d[:, 2] > 0)*100:.0f}%", flush=True)

    def stage_loop(ab):
        def make(K):
            @jax.jit
            def run(op):
                payload, bn, bg = op

                def body(i, acc):
                    tiles = render_tiles_v3(
                        payload, bn, bg,
                        jnp.float32(0.0) + i.astype(jnp.float32) * 1e-12,
                        cfg, ablate=ab)
                    img, _ = assemble_image_v3(tiles, cfg)
                    return acc + img[::256, ::256, 0].sum()
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
            return run
        return make

    base = None
    for ab in variants:
        t0 = time.perf_counter()
        tr = measure(stage_loop(ab), (bf.payload, bins, tbg), k_hi=5)
        wall = time.perf_counter() - t0
        tag = ab if ab else "(none)"
        extra = ""
        if ab == "":
            base = tr
        elif base is not None:
            extra = f"  delta {-(tr - base) * 1e3:+6.2f} ms"
        print(f"ablate {tag:32s}: {tr*1e3:7.2f} ms{extra}  [{wall:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
