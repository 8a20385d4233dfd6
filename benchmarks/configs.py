#!/usr/bin/env python
"""BASELINE.json config matrix: runs the five reference benchmark configs
(scaled by --scale for quick runs; demo/truck/garden .ply files are stripped
from the reference checkout, so deterministic synthetic stand-ins at the
same splat counts are used). Prints one JSON line per config.

  1. static camera, 512x512, SH degree 0
  2. orbit trajectory, full SH3, 720p
  3. ~2.5M splats, free-look, 1080p
  4. ~5.8M splats, 1080p + world-space position output (picking probe)
  5. 4K stress: 10M splats, 8 cameras/step, early-exit on/off sweep
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def run_config(name, n_splats, width, height, sh_degree=3, frames=4,
               early_exit=True, pick=False, scale=1.0):
    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.ops.fast_pipeline import (
        pick_splat_position_fast, render_frame_fast_staged)

    n = max(int(n_splats * scale), 20_000)
    w = max(int(width * scale), 256)
    h = max(int(height * scale), 256)
    cfg = gs.RasterizerConfig(width=w, height=h, sh_degree=sh_degree)
    cloud = gs.mortonize(gs.synthetic_scene(
        n, seed=7, extent=4.0, scale_range=(0.004, 0.03), surfaces=True))
    cams = gs.orbit_trajectory(frames, radius=5.0, target=(0, 0, 6.0))
    unis = [gs.make_uniforms(c, cfg) for c in cams]

    def render(uni):
        return render_frame_fast_staged(cloud, uni, cfg,
                                        early_exit=early_exit)

    out = render(unis[0])
    np.asarray(out.image[0, 0, 0])  # compile + sync

    t0 = time.perf_counter()
    reps = 0
    for uni in unis[:frames]:
        out = render(uni)
        np.asarray(out.image[0, 0, 0])
        reps += 1
    dt = (time.perf_counter() - t0) / reps
    extra = {}
    if pick:
        gx, _ = cfg.tile_dims
        pos = np.asarray(pick_splat_position_fast(out, (h // 32) * gx + w // 32))
        extra["picked_world_pos_finite"] = bool(np.all(np.isfinite(pos)))
    print(json.dumps({
        "config": name, "splats": n, "size": f"{w}x{h}",
        "sh_degree": sh_degree, "early_exit": early_exit,
        "frame_ms": round(dt * 1e3, 1), "fps": round(1 / dt, 2), **extra,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0,
                    help="scale splat counts and resolutions")
    args = ap.parse_args()
    s = args.scale
    run_config("1_demo_512_sh0", 500_000, 512, 512, sh_degree=0, scale=s)
    run_config("2_orbit_720p_sh3", 500_000, 1280, 720, scale=s)
    run_config("3_truck_2.5M_1080p", 2_500_000, 1920, 1080, scale=s)
    run_config("4_garden_5.8M_1080p_pick", 5_800_000, 1920, 1080,
               pick=True, scale=s)
    run_config("5_stress_4K_10M_exit_on", 10_000_000, 3840, 2160, scale=s)
    run_config("5_stress_4K_10M_exit_off", 10_000_000, 3840, 2160,
               early_exit=False, scale=s)


if __name__ == "__main__":
    main()
