#!/usr/bin/env python
"""Headline benchmark: end-to-end render FPS at 1080p on a ~5.8M-splat scene.

Mirrors the reference's published number (BASELINE.md: 108 FPS on bicycle.ply
@1920x1080 on an RTX 3060 Ti) on one TPU chip, using the TPU fast path
(block-hierarchical pipeline + Pallas v3 render kernel; ops/blocks2.py and
ops/render_pallas3.py document the design and its ordering semantics —
>=48 dB PSNR vs exact mode on the adversarial golden corpus).

Frames run DEVICE-SIDE in one jit (fresh camera per frame from a stacked
trajectory, lax.fori_loop): this box reaches the TPU through a tunnel that
costs ~25 ms per dispatch, which is a harness artifact — a local TPU
dispatch is ~0.1 ms — so per-dispatch timing would measure the tunnel, not
the renderer. The demo/garden .ply files are stripped from this checkout,
so the workload is a deterministic synthetic scene with photogrammetry-like
surface-concentrated splats at the same count.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Extra detail goes to stderr.

Env overrides: BENCH_SPLATS, BENCH_FRAMES, BENCH_WIDTH, BENCH_HEIGHT,
BENCH_QUALITY (fast|exact).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 108.0  # /root/reference README.md:58


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.models.splats import mortonize
    from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms

    n_splats = int(os.environ.get("BENCH_SPLATS", 5_800_000))
    n_frames = int(os.environ.get("BENCH_FRAMES", 8))
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    quality = os.environ.get("BENCH_QUALITY", "fast")

    kernel = os.environ.get("GS_KERNEL", "v3")
    cfg = gs.RasterizerConfig(width=width, height=height, quality=quality,
                              kernel=kernel)
    if quality == "fast":
        # device-measured fast-path knobs (tile 32, batch_u 2 — see
        # RasterizerConfig.fast_defaults and FIDELITY_r04.json)
        cfg = cfg.fast_defaults()
    # sweep-only A/B overrides (shipping values live on RasterizerConfig)
    if os.environ.get("GS_WORDS"):
        cfg = cfg.replace(words_payload=os.environ["GS_WORDS"] == "1")
    if os.environ.get("GS_CLUSTER"):
        cfg = cfg.replace(cluster=os.environ["GS_CLUSTER"])
    if os.environ.get("GS_OBIG"):
        cfg = cfg.replace(big_tile_capacity=int(os.environ["GS_OBIG"]))
    if os.environ.get("GS_TILE"):
        ts = int(os.environ["GS_TILE"])
        cfg = cfg.replace(tile_size=ts, batch_u=None)
    if os.environ.get("GS_VMEM"):
        cfg = cfg.replace(kernel_vmem_mb=int(os.environ["GS_VMEM"]))
    log(f"scene: {n_splats} splats, {width}x{height}, quality={quality}, "
        f"tiles={cfg.tile_dims}, backend={jax.default_backend()}")

    t0 = time.perf_counter()
    # Build host-side (device<->host transfers through the tunnel are slow),
    # with the same distribution as benchmarks/bench_v3.py's cached scene.
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benchmarks"))
        from bench_v3 import get_cloud
        cloud = get_cloud(n_splats)
    except Exception as e:
        log(f"scene cache path failed ({e}); building on device")
        cloud = gs.synthetic_scene(n_splats, seed=42, extent=4.0,
                                   scale_range=(0.004, 0.03), surfaces=True)
        if quality == "fast":
            cloud = mortonize(cloud)
    if quality == "fast":
        # resident bf16 SH copy: halves projection's dominant HBM read
        # (ops/sh.py upcasts on read; band math stays f32)
        import dataclasses
        from godotgaussiansplatting_tpu.models.splats import (
            fast_cloud_view)
        cloud = fast_cloud_view(cloud, planar_sh=cfg.projection_kernel)
    log(f"scene built in {time.perf_counter()-t0:.1f}s")

    cams = gs.orbit_trajectory(n_frames, radius=5.0, target=(0, 0, 6.0))
    unis = jax.tree.map(lambda *xs: jnp.stack(xs),
                        *[make_uniforms(c, cfg) for c in cams])

    if quality == "fast":
        from godotgaussiansplatting_tpu.ops.fast_pipeline import \
            render_frame_fast

        def one_frame(cloud, uni):
            out = render_frame_fast(cloud, uni, cfg)
            # full-image sum: forces every pixel live. (A strided ::64
            # subsample looks cheaper but lowers to ~510 scalar dynamic
            # slices + a channel-minor relayout of the planar target —
            # measured ~2.4 ms/frame of pure harness artifact.)
            return (out.image.sum(),
                    out.stats.num_pairs, out.stats.max_tile_count)
    else:
        from godotgaussiansplatting_tpu.ops.pipeline import render_frame

        def one_frame(cloud, uni):
            out = render_frame(cloud, uni, cfg, tile_capacity=4096)
            return (out.image.sum(),
                    out.stats.num_pairs, out.stats.max_tile_count)

    @jax.jit
    def run(cloud, unis, reps):
        # reps rides as a TRACED scalar (dynamic fori_loop bound): the
        # 1-rep and n-rep timing calls then share ONE compiled program —
        # a static reps retraced per value and doubled the cold compile.
        def body(i, acc):
            uni = jax.tree.map(lambda x: x[i % n_frames], unis)
            acc_i, pairs, mx = one_frame(cloud, uni)
            return acc + acc_i
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    log("compiling...")
    t0 = time.perf_counter()
    float(np.asarray(run(cloud, unis, jnp.int32(1))))  # host read forces
    log(f"compile+first frame: {time.perf_counter()-t0:.1f}s")  # execution
    float(np.asarray(run(cloud, unis, jnp.int32(n_frames))))

    times_1, times_n = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(run(cloud, unis, jnp.int32(1))))
        times_1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(np.asarray(run(cloud, unis, jnp.int32(n_frames))))
        times_n.append(time.perf_counter() - t0)
    dt = (min(times_n) - min(times_1)) / (n_frames - 1)
    fps = 1.0 / dt
    log(f"device frame time {dt*1e3:.1f} ms -> {fps:.2f} FPS "
        f"(orbit cameras, whole frame in-graph)")

    print(json.dumps({
        "metric": "end_to_end_fps_1080p_5.8M_splats",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


if __name__ == "__main__":
    main()
