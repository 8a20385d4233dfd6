#!/usr/bin/env python
"""BASELINE.json config matrix: runs the five reference benchmark configs
(scaled by --scale for quick runs; demo/truck/garden .ply files are stripped
from the reference checkout, so deterministic synthetic stand-ins at the
same splat counts are used). Prints one JSON line per config.

  1. static-ish camera, 512x512, SH degree 0
  2. orbit trajectory, full SH3, 720p
  3. ~2.5M splats, 1080p
  4. ~5.8M splats, 1080p + world-space picking probe
  5. 4K stress: 10M splats, early-exit on/off sweep

Frames run device-side in one jit (see bench.py: the axon tunnel costs
~25 ms per dispatch, which would measure the harness, not the renderer).
Scenes build host-side and cache to /tmp (benchmarks/bench_v3.py).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_config(name, n_splats, width, height, sh_degree=3, frames=4,
               early_exit=True, pick=False, scale=1.0):
    import jax
    import jax.numpy as jnp
    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.ops.fast_pipeline import (
        pick_splat_position_fast, render_frame_fast, render_frame_fast_jit)
    from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
    from bench_v3 import get_cloud

    n = max(int(n_splats * scale), 20_000)
    w = max(int(width * scale), 256)
    h = max(int(height * scale), 256)
    cfg = gs.RasterizerConfig(width=w, height=h, sh_degree=sh_degree)
    cloud = get_cloud(n)
    cams = gs.orbit_trajectory(frames, radius=5.0, target=(0, 0, 6.0))
    unis = jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[make_uniforms(c, cfg) for c in cams])

    @jax.jit
    def run(cloud, unis, reps):
        def body(i, acc):
            uni = jax.tree.map(lambda x: x[i % frames], unis)
            out = render_frame_fast(cloud, uni, cfg, early_exit=early_exit)
            return acc + out.image.sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(np.asarray(run(cloud, unis, 1)))
    compile_s = time.perf_counter() - t0
    float(np.asarray(run(cloud, unis, frames)))
    t1s, tns = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(run(cloud, unis, 1)))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(np.asarray(run(cloud, unis, frames)))
        tns.append(time.perf_counter() - t0)
    dt = (min(tns) - min(t1s)) / (frames - 1)

    extra = {}
    if pick:
        uni0 = jax.tree.map(lambda x: x[0], unis)
        out = render_frame_fast_jit(cloud, uni0, cfg)
        gx, _ = cfg.tile_dims
        pos = np.asarray(pick_splat_position_fast(
            out, (h // 32) * gx + w // 32, cloud, 1.0, cfg))
        extra["picked_world_pos_finite"] = bool(np.all(np.isfinite(pos)))
    print(json.dumps({
        "config": name, "splats": n, "size": f"{w}x{h}",
        "sh_degree": sh_degree, "early_exit": early_exit,
        "frame_ms": round(dt * 1e3, 1), "fps": round(1 / dt, 2),
        "compile_s": round(compile_s, 1), **extra,
    }), flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0,
                    help="scale splat counts and resolutions")
    ap.add_argument("--configs", type=str, default="1,2,3,4,5",
                    help="comma-separated subset to run")
    args = ap.parse_args()
    s = args.scale
    want = set(args.configs.split(","))
    if "1" in want:
        run_config("1_demo_512_sh0", 500_000, 512, 512, sh_degree=0, scale=s)
    if "2" in want:
        run_config("2_orbit_720p_sh3", 500_000, 1280, 720, scale=s)
    if "3" in want:
        run_config("3_truck_2.5M_1080p", 2_500_000, 1920, 1080, scale=s)
    if "4" in want:
        run_config("4_garden_5.8M_1080p_pick", 5_800_000, 1920, 1080,
                   pick=True, scale=s)
    if "5" in want:
        run_config("5_stress_4K_10M_exit_on", 10_000_000, 3840, 2160,
                   scale=s)
        run_config("5_stress_4K_10M_exit_off", 10_000_000, 3840, 2160,
                   early_exit=False, scale=s)


if __name__ == "__main__":
    main()
