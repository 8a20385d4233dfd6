#!/usr/bin/env python
"""Whole-frame composition attribution: the round-3 regression hunt.

bench_v3.py stage loops sum to ~121 ms at the headline, but bench.py's
whole-frame in-jit loop measured 167.8 ms (BENCH_r03) — ~46 ms lives in the
composition only. This times the SAME whole-frame function under a
controlled in-jit loop, then peels the composition layer by layer:

  frame          render_frame_fast, full orbit-camera frame (bench.py's body;
                 stats reductions DCE'd, like bench.py's unused outputs)
  frame_fixcam   same but ONE fixed camera (no per-step uniform gather)
  frame_noimg    stats-only probe (image assembly/present DCE'd away)
  frame_stats    image + stats both forced live

Usage: python benchmarks/bench_frame.py [n_splats]
"""

import os
import sys
import time

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
    from godotgaussiansplatting_tpu.ops.fast_pipeline import render_frame_fast
    from bench_v3 import get_cloud, measure

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_800_000
    cfg = gs.RasterizerConfig(width=1920, height=1080).fast_defaults()
    print(f"{n} splats, {cfg.tile_dims} tiles,",
          jax.default_backend(), flush=True)
    cloud = get_cloud(n)
    from godotgaussiansplatting_tpu.models.splats import fast_cloud_view
    cloud = fast_cloud_view(cloud, planar_sh=cfg.projection_kernel)

    n_frames = 8
    cams = gs.orbit_trajectory(n_frames, radius=5.0, target=(0, 0, 6.0))
    unis = jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[make_uniforms(c, cfg) for c in cams])
    uni0 = jax.tree.map(lambda x: x[0], unis)

    def loop(body_fn):
        def make(K):
            @jax.jit
            def run(cloud, unis, reps):
                def body(i, acc):
                    return acc + body_fn(cloud, unis, i)
                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
            return lambda op: run(*op, jnp.int32(K))
        return make

    def frame(cloud, unis, i):
        # bench.py's exact body: stats are computed there but unused in the
        # loop, so XLA DCEs them — only the image-sum survives.
        uni = jax.tree.map(lambda x: x[i % n_frames], unis)
        out = render_frame_fast(cloud, uni, cfg)
        return out.image.sum()

    def frame_stats(cloud, unis, i):
        # force the stats reductions to stay live (1e-20 scale is not
        # foldable and cannot perturb the image sum)
        uni = jax.tree.map(lambda x: x[i % n_frames], unis)
        out = render_frame_fast(cloud, uni, cfg)
        return (out.image.sum()
                + out.stats.num_pairs.astype(jnp.float32) * 1e-20
                + out.stats.max_tile_count.astype(jnp.float32) * 1e-20)

    def frame_fixcam(cloud, unis, i):
        uni = jax.tree.map(lambda x: x[0], unis)
        uni = uni._replace(time=uni.time + i.astype(jnp.float32) * 1e-6)
        out = render_frame_fast(cloud, uni, cfg)
        return out.image.sum()

    def frame_noimg(cloud, unis, i):
        uni = jax.tree.map(lambda x: x[i % n_frames], unis)
        out = render_frame_fast(cloud, uni, cfg)
        return out.stats.num_pairs.astype(jnp.float32)

    for name, fn in [("frame", frame), ("frame_fixcam", frame_fixcam),
                     ("frame_noimg", frame_noimg),
                     ("frame_stats", frame_stats)]:
        t = measure(loop(fn), (cloud, unis), k_hi=5)
        print(f"{name:14s}: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
