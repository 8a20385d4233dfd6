#!/usr/bin/env python
"""Device-mode race-regression smoke (run BEFORE any measurement batch).

Interpret-mode tests cannot see device DMA ordering: commit 0195dab fixed
a v4 header race that interpret mode hid. This runs BOTH render kernels on
the real device at shapes that exercise the cross-step row DMA, the chain
batch ring (tiles deeper than one batch), resident big lanes and the
straddle gates, and demands BIT-equality:

  * v3 vs v4 images bit-equal (identical ordering semantics by design);
  * fused (render_frame_fast) vs staged (render_frame_fast_staged
    composition) v3 images bit-equal — same kernel, different surrounding
    XLA programs, so a DMA ordering bug that depends on input layout or
    scheduling shows up as a diff;
  * two repeat runs of the same program bit-equal (nondeterminism probe).

Exits non-zero on any mismatch. ~2-4 min cold, seconds warm.

Usage: python benchmarks/device_smoke.py [n_splats] [size]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
    from godotgaussiansplatting_tpu.ops.fast_pipeline import (
        render_frame_fast)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    # wide scale range: guarantees big lanes (extent >= BIG_RADIUS) AND
    # multi-batch chain tiles, so the ring + big DMA paths both run
    cloud = gs.synthetic_scene(n, seed=11, extent=3.0,
                               scale_range=(0.01, 0.25))
    from godotgaussiansplatting_tpu.models.splats import mortonize
    cloud = mortonize(cloud)
    cfg = gs.RasterizerConfig(width=size, height=size, quality="fast")
    cam = gs.Camera.reset_pose()
    uni = make_uniforms(cam, cfg)

    def run(kernel):
        kcfg = cfg.replace(kernel=kernel)
        f = jax.jit(lambda c, u: render_frame_fast(c, u, kcfg).image)
        return f(cloud, uni)

    img3 = np.asarray(run("v3"))
    img3b = np.asarray(run("v3"))
    img4 = np.asarray(run("v4"))

    fails = []
    if not np.array_equal(img3, img3b):
        fails.append(f"v3 nondeterministic: max diff "
                     f"{np.abs(img3 - img3b).max():.3e}")
    if not np.array_equal(img3, img4):
        fails.append(f"v3 vs v4 differ: max diff "
                     f"{np.abs(img3 - img4).max():.3e} at "
                     f"{np.unravel_index(np.abs(img3 - img4).argmax(), img3.shape)}")

    # fused vs staged composition (different XLA programs, same kernel)
    from godotgaussiansplatting_tpu.ops.fast_pipeline import (
        _stage_project, _stage_blocks, _stage_bin, _stage_render)
    prj = _stage_project(cloud, uni, cfg)
    bf, bigs = _stage_blocks(prj, cfg, cloud.num_splats)
    bins, tbg = _stage_bin(bf, bigs, cfg, 1024, 256, None)
    img_st, _, _ = _stage_render(bf, bins, tbg, uni.heatmap_factor, cfg,
                                 True, True)
    if not np.array_equal(img3, np.asarray(img_st)):
        fails.append(f"fused vs staged differ: max diff "
                     f"{np.abs(img3 - np.asarray(img_st)).max():.3e}")

    # Mosaic-lowered transcendental accuracy (round-4 ADVICE): CPU
    # interpret tests cover the XLA-simplifier path only; on hardware the
    # lowp path runs jnp.exp/log1p through Mosaic's VPU transcendental
    # lowering with bf16 la accumulators. Demand the lowp image stays
    # within quantization distance of the f32-accumulator image — a
    # lowering regression (wrong rounding mode, cancellation) craters this.
    from godotgaussiansplatting_tpu.ops.render_pallas3 import render_tiles_v3
    t_lo = np.asarray(jax.jit(
        lambda p, bn, bg, h: render_tiles_v3(p, bn, bg, h, cfg, lowp=True)
    )(bf.payload, bins, tbg, uni.heatmap_factor))
    t_hi = np.asarray(jax.jit(
        lambda p, bn, bg, h: render_tiles_v3(p, bn, bg, h, cfg, lowp=False)
    )(bf.payload, bins, tbg, uni.heatmap_factor))
    mse = float(((t_lo - t_hi) ** 2).mean())
    psnr = 10 * np.log10(max(float(np.abs(t_hi).max()), 1.0) ** 2
                         / max(mse, 1e-12))
    print(f"lowp vs f32-accum PSNR {psnr:.1f} dB (gate 55)")
    if psnr < 55.0:
        fails.append(f"Mosaic lowp transcendental accuracy: {psnr:.1f} dB")

    live = float(np.abs(img3[:3]).sum())
    print(f"image mass {live:.1f} (must be > 0: {live > 0})")
    if live == 0.0:
        fails.append("image is empty — smoke scene misconfigured")
    if fails:
        for f_ in fails:
            print("FAIL:", f_)
        sys.exit(1)
    print("device smoke OK: v3 deterministic, v3 == v4 bitwise, "
          "fused == staged")


if __name__ == "__main__":
    main()
