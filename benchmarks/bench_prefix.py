#!/usr/bin/env python
"""Prefix attribution of the whole-frame composition.

bench_frame.py showed the gap (stage sum ~121 ms vs whole frame ~168 ms)
is not camera variance and not the stats reductions. This times the SAME
fused program with progressively longer live prefixes (XLA DCEs everything
past the probe), so the deltas attribute the whole-frame time to stages
AS COMPOSED — including any fusion/layout overheads the per-stage benches
(bench_v3.py) cannot see:

  p_proj    projection only
  p_blocks  + block build (payload + bigs tables live)
  p_bins    + binning (tile lists + big bins live)
  p_prep    + bigla prepass + slab gather + packed rows (render inputs live,
              Pallas call itself DCE'd)
  p_full    the whole frame (image live)

Usage: python benchmarks/bench_prefix.py [n_splats]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import dataclasses

    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
    from godotgaussiansplatting_tpu.ops.projection import project_splats
    from godotgaussiansplatting_tpu.ops.fast_pipeline import (
        _slim_projection, render_frame_fast)
    from godotgaussiansplatting_tpu.ops.blocks2 import build_block_frame2
    from godotgaussiansplatting_tpu.ops.binning2 import bin_blocks2
    from godotgaussiansplatting_tpu.ops.bigbin import bin_bigs
    from godotgaussiansplatting_tpu.ops.render_pallas3 import (
        pack_tile_rows_v3, prepass_big_la)
    from bench_v3 import get_cloud, measure

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_800_000
    cfg = gs.RasterizerConfig(width=1920, height=1080, quality="fast")
    print(f"{n} splats, {cfg.tile_dims} tiles,",
          jax.default_backend(), flush=True)
    cloud = get_cloud(n)
    from godotgaussiansplatting_tpu.models.splats import fast_cloud_view
    cloud = fast_cloud_view(cloud, planar_sh=cfg.projection_kernel)

    n_frames = 8
    cams = gs.orbit_trajectory(n_frames, radius=5.0, target=(0, 0, 6.0))
    unis = jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[make_uniforms(c, cfg) for c in cams])

    def loop(body_fn):
        def make(K):
            @jax.jit
            def run(cloud, unis, reps):
                def body(i, acc):
                    return acc + body_fn(cloud, unis, i)
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
            return lambda op: run(*op, jnp.int32(K))
        return make

    def prefix(cloud, uni, stop):
        """Replicates render_frame_fast's body up to `stop`, returns a probe
        that keeps exactly that prefix live."""
        prj = project_splats(
            cloud.means, cloud.cov3d, cloud.opacity, cloud.sh,
            cloud.upload_time, uni.view, uni.proj, uni.camera_pos,
            uni.model_scale, uni.time, cfg)
        prj = _slim_projection(prj)
        prj = type(prj)(*jax.lax.optimization_barrier(tuple(prj)))
        if stop == "proj":
            return prj.image_pos.ravel()[::65536].sum()
        bf, bigs = build_block_frame2(prj, cfg, num_splats=cloud.num_splats,
                                      big_cap=cfg.big_capacity)
        bf = type(bf)(*jax.lax.optimization_barrier(tuple(bf)))
        bigs = type(bigs)(*jax.lax.optimization_barrier(tuple(bigs)))
        if stop == "blocks":
            return (bf.payload.ravel()[::65536].sum()
                    + bigs.table.ravel()[::4096].sum())
        bins = bin_blocks2(bf, cfg, supertile_cap=1024, tile_cap=256)
        tile_bigs = bin_bigs(bigs, cfg, obig=cfg.big_tile_capacity)
        bins = type(bins)(*jax.lax.optimization_barrier(tuple(bins)))
        tile_bigs = type(tile_bigs)(*jax.lax.optimization_barrier(
            tuple(tile_bigs)))
        if stop == "bins":
            return (bins.tile_nblocks.sum() + bins.tile_blocks[:, 0].sum()
                    + tile_bigs.tile_nbig.sum()).astype(jnp.float32)
        # render-input prep (mirrors render_tiles_v3's XLA-side work)
        rows = pack_tile_rows_v3(bins.tile_blocks, bins.tile_nblocks,
                                 tile_bigs.tile_nbig, bins.tile_minmax,
                                 bins.tile_candidates,
                                 uni.heatmap_factor, cfg)
        bigla = prepass_big_la(tile_bigs.bigpay, cfg, lowp=True)
        from godotgaussiansplatting_tpu.ops.blocks2 import (
            BLOCK_SIZE, PAYLOAD_WIDTH)
        slab_u, Un = cfg.slab_u, cfg.batch_u or 4
        Wb = slab_u * Un
        ids = jnp.maximum(bins.tile_blocks[:, :Wb], 0).astype(jnp.int32)
        TG = rows.shape[0]
        slab = bf.payload[ids.reshape(-1)]
        slab = slab.reshape(TG, Wb, PAYLOAD_WIDTH, BLOCK_SIZE)
        slab = slab.transpose(0, 2, 1, 3).reshape(
            TG, PAYLOAD_WIDTH, Wb * BLOCK_SIZE)
        if stop == "prep":
            return (rows.ravel()[::65536].sum().astype(jnp.float32)
                    + bigla.ravel()[::65536].sum().astype(jnp.float32)
                    + slab.ravel()[::65536].sum())
        out = render_frame_fast(cloud, uni, cfg)
        return out.image.sum()

    def mk(stop):
        def body(cloud, unis, i):
            uni = jax.tree.map(lambda x: x[i % n_frames], unis)
            return prefix(cloud, uni, stop)
        return body

    for stop in ["proj", "blocks", "bins", "prep", "full"]:
        t = measure(loop(mk(stop)), (cloud, unis), k_hi=5)
        print(f"p_{stop:7s}: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
