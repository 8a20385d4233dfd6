#!/usr/bin/env python
"""Isolate WHERE the fast-vs-exact deviation at headline scale comes from.

Variants, each one PSNR against the baseline exact frame:
  exact-rev   exact pipeline fed the reverse splat order — the reference's
              own tie-order nondeterminism envelope (its GPU sort races on
              equal keys, SURVEY.md §2.1); any fast-path number should be
              judged against this, not against 'inf'
  fast        shipped fast path
  fast-noexit early_exit disabled (isolates the batch-granular exit)
  fast-caps   supertile_cap 2048 (isolates supertile binning truncation;
              tile_cap stays 256 — the row packing limit)
  fast-ob256  big_tile_capacity 256 (isolates big-lane truncation)

With `corr` as a second argument, per-splat colors are replaced by a
SMOOTH function of position (realistic scenes have spatially correlated
color; the benchmark scene's per-splat uniform-random DC makes every
ordering difference maximally visible, which is what the exact-rev
envelope quantifies).

Usage: python benchmarks/fidelity_probe.py [n_splats] [corr]
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
        # smooth position-driven DC color, zero higher-order SH (host-side,
        # then one upload — device round-trips through the tunnel are slow)
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

    def exact(cloud, cap=8192):
        return jax.jit(lambda c, u: render_frame(
            c, u, cfg.replace(quality="exact"),
            tile_capacity=cap).image)(cloud, uni)

    t0 = time.perf_counter()
    base = exact(cloud)
    np.asarray(base)
    print(f"exact base {time.perf_counter()-t0:.0f}s", flush=True)

    # reverse the splat order (valid prefix only stays a prefix: reverse the
    # first num_splats entries, keep padding at the tail)
    import dataclasses
    nsp = cloud.num_splats
    perm = np.arange(cloud.capacity)
    perm[:nsp] = perm[:nsp][::-1]
    rev = dataclasses.replace(
        cloud,
        means=cloud.means[perm], cov3d=cloud.cov3d[perm],
        opacity=cloud.opacity[perm], sh=cloud.sh[perm],
        upload_time=cloud.upload_time[perm])
    t0 = time.perf_counter()
    img = exact(rev)
    p = float(np.asarray(psnr(img, base)))
    print(f"exact-rev  : {p:6.2f} dB   ({time.perf_counter()-t0:.0f}s)",
          flush=True)

    variants = [
        ("fast", dict()),
        ("fast-noexit", dict(early_exit=False)),
        ("fast-caps", dict(supertile_cap=2048)),
        ("fast-ob256", dict(obig=256)),
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
