#!/usr/bin/env python
"""Second-round isolation of the headline-scale fast-path fidelity gap.

fidelity_probe.py (corr variant) showed: exact-rev 59.6 dB but fast 29.9 dB,
IDENTICAL under early-exit off / supertile-cap 2x / obig 2x — so the gap is
in the core compositing approximation. Remaining candidates, one flag each:

  fast-f32    lowp=False — chain/big alpha state in f32 instead of bf16
              (isolates bf16 rounding of log1p(-alpha) accumulation)
  fast-u8     batch_u=8 — doubles the exact in-batch window and halves the
              number of cross-batch seams (isolates cross-batch
              interleaving depth)
  fast-u8f32  both (their interaction)

Usage: python benchmarks/fidelity_probe2.py [n_splats] [corr]
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

    @jax.jit
    def psnr(a, b):
        mse = jnp.mean((a[..., :3] - b[..., :3]) ** 2)
        return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

    t0 = time.perf_counter()
    base = jax.jit(lambda c, u: render_frame(
        c, u, cfg.replace(quality="exact"),
        tile_capacity=8192).image)(cloud, uni)
    np.asarray(base)
    print(f"exact base {time.perf_counter()-t0:.0f}s", flush=True)

    variants = [
        ("fast-f32", dict(lowp=False)),
        ("fast-u8", dict(batch_u=8)),
        ("fast-u8f32", dict(batch_u=8, lowp=False)),
    ]
    for name, kw in variants:
        f = jax.jit(lambda c, u, kw=kw: render_frame_fast(
            c, u, cfg, **kw).image)
        t0 = time.perf_counter()
        img = f(cloud, uni)
        p = float(np.asarray(psnr(img, base)))
        print(f"{name:11s}: {p:6.2f} dB   ({time.perf_counter()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
