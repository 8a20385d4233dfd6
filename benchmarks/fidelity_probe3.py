#!/usr/bin/env python
"""Decompose the headline fast-vs-exact error by KIND, not by knob.

probe/probe2 showed the ~30 dB (corr-scene) gap is invariant under early
exit, caps, obig, f32 state, and a 2x exact window — so it is NOT
compositing-order noise in the chain loop. This probe downloads the two
frames and classifies the residual:

  * signed luminance delta stats  — systematic sign = missing/extra mass;
    zero-mean = ordering/permutation noise
  * PSNR after 8x8 box blur       — ordering noise averages out under blur;
    a mass deficit survives it
  * error vs position-in-tile     — coverage-gate or rect off-by-ones
    concentrate error at 16x16 tile borders
  * exact vs fast tile_t0         — per-tile pixel-0 transmittance: direct
    total-mass comparison at 8160 probe points
  * error-map PNG (gain 8x)       — eyeball the spatial structure

Usage: python benchmarks/fidelity_probe3.py [n_splats] [corr]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_v3 import get_cloud  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.ops.pipeline import (make_uniforms,
                                                         render_frame)
    from godotgaussiansplatting_tpu.ops.fast_pipeline import render_frame_fast

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_800_000
    corr = len(sys.argv) > 2 and sys.argv[2] == "corr"
    cfg = gs.RasterizerConfig(width=1920, height=1080, quality="fast")
    cloud = get_cloud(n)
    if corr:
        import dataclasses
        m = np.asarray(cloud.means)
        dc = 0.5 + 0.45 * np.stack([
            np.sin(1.3 * m[:, 0]) * np.cos(0.7 * m[:, 2]),
            np.sin(1.1 * m[:, 1] + 2.0),
            np.cos(0.9 * m[:, 0] + 0.5 * m[:, 1]),
        ], axis=1).astype(np.float32)
        sh = np.zeros_like(np.asarray(cloud.sh))
        sh[:, 0] = dc
        cloud = dataclasses.replace(cloud, sh=jnp.asarray(sh))
        print("correlated-color variant", flush=True)
    cam = gs.orbit_trajectory(1, radius=5.0, target=(0, 0, 6.0))[0]
    uni = make_uniforms(cam, cfg)

    t0 = time.perf_counter()
    ex = jax.jit(lambda c, u: render_frame(
        c, u, cfg.replace(quality="exact"), tile_capacity=8192))(cloud, uni)
    E = np.asarray(ex.image)[..., :3]
    et0 = np.asarray(ex.tile_t0)
    print(f"exact {time.perf_counter()-t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    fa = jax.jit(lambda c, u: render_frame_fast(c, u, cfg))(cloud, uni)
    F = np.asarray(fa.image)[..., :3]
    ft0 = np.asarray(fa.tile_t0)
    print(f"fast  {time.perf_counter()-t0:.0f}s", flush=True)

    def psnr(a, b):
        mse = float(((a - b) ** 2).mean())
        return -10.0 * np.log10(max(mse, 1e-12))

    d = F - E
    lum = d.mean(axis=-1)
    print(f"PSNR          : {psnr(F, E):6.2f} dB")
    print(f"signed lum    : mean {lum.mean():+.5f}  median "
          f"{np.median(lum):+.5f}  P5 {np.percentile(lum, 5):+.4f}  "
          f"P95 {np.percentile(lum, 95):+.4f}")

    # 8x8 box blur via reshape-mean (1080 = 135*8, 1920 = 240*8)
    def blur(a):
        return a[:1080].reshape(135, 8, 240, 8, 3).mean(axis=(1, 3))
    print(f"PSNR blur8    : {psnr(blur(F), blur(E)):6.2f} dB")

    # error vs position within the 16x16 tile
    ts = cfg.tile_size
    h, w = 1080 // ts * ts, 1920 // ts * ts
    e2 = (d[:h, :w] ** 2).mean(axis=-1)
    e2t = e2.reshape(h // ts, ts, w // ts, ts).mean(axis=(0, 2))  # (ts, ts)
    print(f"rmse inner 4x4 center: {np.sqrt(e2t[6:10, 6:10].mean()):.5f}")
    print(f"rmse border ring     : "
          f"{np.sqrt((e2t.sum() - e2t[1:-1, 1:-1].sum()) / (4*ts-4)):.5f}")
    print(f"rmse rows 0..3       : {[f'{np.sqrt(e2t[i].mean()):.5f}' for i in range(4)]}")
    print(f"rmse cols 0..3       : {[f'{np.sqrt(e2t[:, i].mean()):.5f}' for i in range(4)]}")

    # per-tile pixel-0 transmittance
    dt0 = ft0 - et0
    print(f"tile_t0 delta : mean {dt0.mean():+.6f}  max|.| "
          f"{np.abs(dt0).max():.4f}  P99|.| "
          f"{np.percentile(np.abs(dt0), 99):.5f}")

    from godotgaussiansplatting_tpu.utils.image import write_png
    err = np.clip(np.abs(d) * 8.0, 0.0, 1.0)
    write_png("/tmp/errmap.png", np.concatenate(
        [err, np.ones_like(err[..., :1])], axis=-1))
    write_png("/tmp/exact.png", np.concatenate(
        [np.clip(E, 0, 1), np.ones_like(E[..., :1])], axis=-1))
    write_png("/tmp/fast.png", np.concatenate(
        [np.clip(F, 0, 1), np.ones_like(F[..., :1])], axis=-1))
    print("wrote /tmp/errmap.png /tmp/exact.png /tmp/fast.png", flush=True)


if __name__ == "__main__":
    main()
