#!/usr/bin/env python
"""Per-stage timing of the fast pipeline with in-jit iteration loops.

The tunneled TPU in this environment costs ~25 ms per executable dispatch
(round-trip), which swamps any stage under that. Stage cost is therefore
measured by running K iterations of the stage inside ONE jit (lax.fori_loop),
perturbing a scalar input per iteration so XLA cannot hoist the loop body,
and differencing K=1 vs K=K runs.

Usage: python benchmarks/stage_bench.py [n_splats] [stage...]
Stages: project blocks bin render frame
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(make_loop, k_hi=9):
    """make_loop(K) -> callable returning a small array; returns s/iter."""
    f1, fk = make_loop(1), make_loop(k_hi)
    np.asarray(f1())
    np.asarray(fk())
    t1s, tks = [], []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f1())
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk())
        tks.append(time.perf_counter() - t0)
    return (min(tks) - min(t1s)) / (k_hi - 1)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.models.splats import mortonize
    from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
    from godotgaussiansplatting_tpu.ops import fast_pipeline as fp
    from godotgaussiansplatting_tpu.ops.blocks import build_block_frame
    from godotgaussiansplatting_tpu.ops.binning import bin_blocks
    from godotgaussiansplatting_tpu.ops.projection import project_splats
    from godotgaussiansplatting_tpu.ops.render_pallas import (
        assemble_image, render_tiles_pallas)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_800_000
    which = set(sys.argv[2:]) or {"project", "blocks", "bin", "render"}
    cfg = gs.RasterizerConfig(width=1920, height=1080, quality="fast")
    print(f"{n} splats, {cfg.tile_dims} tiles,", jax.default_backend(),
          flush=True)

    t0 = time.perf_counter()
    cloud = mortonize(gs.synthetic_scene(n, seed=42, extent=4.0,
                                         scale_range=(0.004, 0.03),
                                         surfaces=True))
    uni = make_uniforms(gs.orbit_trajectory(1, radius=5.0,
                                            target=(0, 0, 6.0))[0], cfg)
    print(f"scene built {time.perf_counter()-t0:.0f}s", flush=True)

    def perturbed(u, i):
        # time only affects the (saturated) fade-in; workload is identical.
        return u._replace(time=u.time + i.astype(jnp.float32) * 1e-6)

    def stage_loop(stage_fn, probe):
        """Loop stage_fn(i) inside one jit; probe(out) -> small accumulator."""
        def make(K):
            @jax.jit
            def run():
                def body(i, acc):
                    return acc + probe(stage_fn(i))
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
            return run
        return make

    results = {}

    if "project" in which:
        def st(i):
            u = perturbed(uni, i)
            return project_splats(cloud.means, cloud.cov3d, cloud.opacity,
                                  cloud.sh, cloud.upload_time, u.view, u.proj,
                                  u.camera_pos, u.model_scale, u.time, cfg)
        results["project"] = measure(stage_loop(
            st, lambda p: p.image_pos.ravel()[::65536].sum()
            + p.num_tiles[::65536].sum().astype(jnp.float32)))
        print(f"project: {results['project']*1e3:7.2f} ms", flush=True)

    prj = jax.jit(lambda: project_splats(
        cloud.means, cloud.cov3d, cloud.opacity, cloud.sh, cloud.upload_time,
        uni.view, uni.proj, uni.camera_pos, uni.model_scale, uni.time, cfg))()
    prj = jax.tree.map(lambda x: jax.block_until_ready(x), prj)

    if "blocks" in which:
        def st(i):
            p = prj._replace(
                depth16=(prj.depth16 + i.astype(jnp.uint32) * 0))
            # perturb image_pos epsilon so the sort can't be hoisted
            p = p._replace(image_pos=p.image_pos
                           + i.astype(jnp.float32) * 1e-7)
            return build_block_frame(p, cfg)
        results["blocks"] = measure(stage_loop(
            st, lambda b: b.payload.ravel()[::65536].sum()))
        print(f"blocks : {results['blocks']*1e3:7.2f} ms", flush=True)

    bf = jax.jit(lambda: build_block_frame(prj, cfg))()
    bf = jax.tree.map(lambda x: jax.block_until_ready(x), bf)

    if "bin" in which:
        def st(i):
            b = bf._replace(min_depth=bf.min_depth + i.astype(jnp.uint32) * 0,
                            rect=bf.rect + (i * 0).astype(jnp.int32))
            return bin_blocks(b, cfg)
        results["bin"] = measure(stage_loop(
            st, lambda t: t.tile_nblocks.sum().astype(jnp.float32)))
        print(f"bin    : {results['bin']*1e3:7.2f} ms", flush=True)

    bins = jax.jit(lambda: bin_blocks(bf, cfg))()
    bins = jax.tree.map(lambda x: jax.block_until_ready(x), bins)
    print("mean blocks/tile:", float(np.mean(np.asarray(bins.tile_nblocks))),
          " max:", int(np.max(np.asarray(bins.tile_nblocks))),
          " pairs:", int(np.sum(np.asarray(bins.tile_nblocks))), flush=True)

    if "render" in which:
        def st(i):
            pay = bf.payload + i.astype(jnp.float32) * 0
            tiles = render_tiles_pallas(
                pay, bins.tile_blocks, bins.tile_nblocks,
                bins.tile_candidates, jnp.float32(0.0), cfg)
            return assemble_image(tiles, cfg)[0]
        results["render"] = measure(stage_loop(
            st, lambda im: im[::256, ::256, 0].sum()), k_hi=5)
        print(f"render : {results['render']*1e3:7.2f} ms", flush=True)

    total = sum(results.values())
    print(f"TOTAL  : {total*1e3:7.2f} ms -> {1.0/total:5.1f} FPS "
          f"(in-jit, no dispatch overhead)", flush=True)


if __name__ == "__main__":
    main()
