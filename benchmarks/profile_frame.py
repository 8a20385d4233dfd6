#!/usr/bin/env python
"""Capture a device profile of the whole fast-path frame and dump the
per-HLO-op time table (ground truth for composed-frame attribution).

Usage: python benchmarks/profile_frame.py [n_splats] [outdir]
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
    from godotgaussiansplatting_tpu.ops.fast_pipeline import render_frame_fast
    from bench_v3 import get_cloud

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_800_000
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gsprof"
    cfg = gs.RasterizerConfig(width=1920, height=1080,
                              quality="fast").fast_defaults()
    cloud = get_cloud(n)
    from godotgaussiansplatting_tpu.models.splats import fast_cloud_view
    cloud = fast_cloud_view(cloud, planar_sh=cfg.projection_kernel)

    n_frames = 8
    cams = gs.orbit_trajectory(n_frames, radius=5.0, target=(0, 0, 6.0))
    unis = jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[make_uniforms(c, cfg) for c in cams])

    @jax.jit
    def run(cloud, unis, reps):
        def body(i, acc):
            uni = jax.tree.map(lambda x: x[i % n_frames], unis)
            out = render_frame_fast(cloud, uni, cfg)
            return acc + out.image.sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    print("warmup/compile...", flush=True)
    float(np.asarray(run(cloud, unis, jnp.int32(1))))
    print("tracing 8 frames...", flush=True)
    with jax.profiler.trace(outdir):
        float(np.asarray(run(cloud, unis, jnp.int32(8))))
    print(f"trace written to {outdir}", flush=True)


if __name__ == "__main__":
    main()
