#!/usr/bin/env python
"""v3 pipeline benchmark: real headline-scale frame data, per-stage timings.

All timings use in-jit fori_loops (the tunneled TPU costs ~25 ms per
dispatch, so single-dispatch timing is meaningless). The scene is cached to
/tmp so repeated runs skip the ~10 min host-side build. Operands are
threaded as jit ARGUMENTS — closing over multi-hundred-MB arrays embeds
them as HLO constants and kills the remote compiler.

Usage: python benchmarks/bench_v3.py [n_splats] [tile_size]
Env: BENCH_STAGES=0 to skip prep-stage timings.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def get_cloud(n):
    """Build (or load) the benchmark scene fully host-side, then upload once.

    Keeping the build on host matters: device<->host transfers through the
    axon tunnel are slow, so the cache must be written from numpy arrays
    BEFORE anything touches the device."""
    import time as _t
    import jax
    from godotgaussiansplatting_tpu.models.splats import (
        SplatCloud, _pad, build_covariance, PAD_MULTIPLE)
    from godotgaussiansplatting_tpu.ops.blocks import order_splats
    import jax.numpy as jnp

    from godotgaussiansplatting_tpu.ops.blocks import CURVE
    cache = f"/tmp/scene_{n}.npz" if CURVE == "morton" \
        else f"/tmp/scene_{n}_{CURVE}.npz"
    if not os.path.exists(cache):
        # Reproduce synthetic_scene(seed=42, surfaces=True) + mortonize
        # without instantiating device arrays.
        rng = np.random.default_rng(42)
        extent, scale_range = 4.0, (0.004, 0.03)
        k = max(64, n // 4096)
        centers = rng.uniform(-extent, extent, (k, 3)).astype(np.float32)
        normals = rng.normal(size=(k, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        sizes = rng.uniform(0.15, 0.8, (k, 1)).astype(np.float32) * extent * 0.4
        u = rng.normal(size=(k, 3)).astype(np.float32)
        u -= (u * normals).sum(-1, keepdims=True) * normals
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        v = np.cross(normals, u)
        pid = rng.integers(0, k, n)
        a = rng.normal(size=(n, 1)).astype(np.float32)
        b = rng.normal(size=(n, 1)).astype(np.float32)
        c = rng.normal(0, 0.02, (n, 1)).astype(np.float32)
        means = (centers[pid] + sizes[pid] * (a * u[pid] + b * v[pid])
                 + c * extent * normals[pid]).astype(np.float32)
        means = np.clip(means, -1.6 * extent, 1.6 * extent)
        means[:, 2] += extent * 1.5
        scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        opac = np.where(rng.random(n) < 0.7,
                        rng.uniform(0.85, 1.0, n),
                        rng.uniform(0.05, 0.6, n)).astype(np.float32)
        sh = np.zeros((n, 16, 3), np.float32)
        sh[:, 0] = rng.uniform(-1.0, 2.0, (n, 3))
        sh[:, 1:16] = rng.normal(0, 0.12, (n, 15, 3))
        order = order_splats(means)
        cov6 = build_covariance(scales[order], quats[order])
        cap = max(PAD_MULTIPLE, -(-n // PAD_MULTIPLE) * PAD_MULTIPLE)
        np.savez(cache, means=_pad(means[order], cap), cov3d=_pad(cov6, cap),
                 opacity=_pad(opac[order], cap),
                 sh=_pad(sh[order].astype(np.float32), cap),
                 upload_time=np.zeros(cap, np.float32), num_splats=n)
    z = np.load(cache)
    t0 = _t.perf_counter()
    cl = SplatCloud(
        means=jnp.asarray(z["means"]), cov3d=jnp.asarray(z["cov3d"]),
        opacity=jnp.asarray(z["opacity"]), sh=jnp.asarray(z["sh"]),
        upload_time=jnp.asarray(z["upload_time"]),
        num_splats=int(z["num_splats"]))
    jax.block_until_ready(cl.means)
    print(f"upload {_t.perf_counter()-t0:.0f}s", flush=True)
    return cl


def measure(make_loop, operand, k_hi=9):
    f1, fk = make_loop(1), make_loop(k_hi)
    np.asarray(f1(operand))
    np.asarray(fk(operand))
    t1s, tks = [], []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f1(operand))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fk(operand))
        tks.append(time.perf_counter() - t0)
    return (min(tks) - min(t1s)) / (k_hi - 1)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
    from godotgaussiansplatting_tpu.ops.projection import project_splats
    from godotgaussiansplatting_tpu.ops.blocks2 import build_block_frame2
    from godotgaussiansplatting_tpu.ops.bigbin import bin_bigs
    from godotgaussiansplatting_tpu.ops.binning2 import bin_blocks2
    from godotgaussiansplatting_tpu.ops.render_pallas3 import (
        assemble_image_v3, render_tiles_v3)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_800_000
    # argv[2]: tile size override (0/absent = fast_defaults' measured best);
    # GS_PROJKERN=0 forces the jnp projection for A/Bs
    ts = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    cfg = gs.RasterizerConfig(width=1920, height=1080).fast_defaults()
    if ts:
        cfg = cfg.replace(tile_size=ts,
                          batch_u=None if ts == 16 else cfg.batch_u)
    if os.environ.get("GS_PROJKERN"):
        cfg = cfg.replace(projection_kernel=os.environ["GS_PROJKERN"] == "1")
    print(f"{n} splats, tile {cfg.tile_size} -> {cfg.tile_dims} tiles, "
          f"projkern={cfg.projection_kernel},",
          jax.default_backend(), flush=True)

    t0 = time.perf_counter()
    cloud = get_cloud(n)
    import dataclasses
    from godotgaussiansplatting_tpu.models.splats import fast_cloud_view
    cloud = fast_cloud_view(cloud, planar_sh=cfg.projection_kernel)
    uni = make_uniforms(gs.orbit_trajectory(1, radius=5.0,
                                            target=(0, 0, 6.0))[0], cfg)
    print(f"scene ready {time.perf_counter()-t0:.0f}s", flush=True)

    # --- stage outputs (single shot) ----------------------------------------
    if cfg.projection_kernel:
        from godotgaussiansplatting_tpu.ops.projection_pallas import (
            project_words)
        from godotgaussiansplatting_tpu.ops.blocks2 import (
            build_block_frame2_words)
        prj = jax.jit(
            lambda c, u: project_words(
                c.means, c.cov3d, c.opacity, c.sh, c.upload_time,
                u.view, u.proj, u.camera_pos, u.model_scale, u.time, cfg,
                num_splats=n),
        )(cloud, uni)
        prj = jax.block_until_ready(prj)
        bf, bigs = jax.jit(
            lambda p: build_block_frame2_words(p, cfg))(prj)
    else:
        prj = jax.jit(
            lambda c, u: project_splats(
                c.means, c.cov3d, c.opacity, c.sh, c.upload_time,
                u.view, u.proj, u.camera_pos, u.model_scale, u.time, cfg),
        )(cloud, uni)
        prj = jax.block_until_ready(prj)
        bf, bigs = jax.jit(
            lambda p: build_block_frame2(p, cfg, num_splats=n))(prj)
    bins = jax.jit(lambda b: bin_blocks2(b, cfg))(bf)
    tbg = jax.jit(lambda b: bin_bigs(b, cfg))(bigs)

    nb_arr = np.asarray(bins.tile_nblocks)
    nbig_arr = np.asarray(tbg.tile_nbig)
    if cfg.projection_kernel:
        true_pairs = int(np.asarray(prj.cnt).reshape(-1, 128)[:, 1].sum())
    else:
        true_pairs = int(np.asarray(prj.num_tiles).sum())
    blk_pairs = int(nb_arr.sum())
    print(f"true splat-tile pairs: {true_pairs/1e6:.1f}M | "
          f"tile-block pairs: {blk_pairs/1e3:.0f}K "
          f"(x128 = {blk_pairs*128/1e6:.1f}M, dilution "
          f"{blk_pairs*128/max(true_pairs,1):.2f}x) | "
          f"blocks/tile mean {nb_arr.mean():.1f} max {nb_arr.max()} | "
          f"bigs/tile mean {nbig_arr.mean():.1f} | "
          f"overflow {int(np.asarray(bins.overflow))}"
          f"+{int(np.asarray(tbg.overflow))}", flush=True)

    # --- stage timings ------------------------------------------------------
    def stage_loop(stage_fn, probe):
        def make(K):
            @jax.jit
            def run(op):
                def body(i, acc):
                    return acc + probe(stage_fn(i, op))
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
            return run
        return make

    if os.environ.get("BENCH_STAGES", "1") == "1":
        if cfg.projection_kernel:
            def st_proj(i, op):
                c, u = op
                u2 = u._replace(time=u.time + i.astype(jnp.float32) * 1e-6)
                return project_words(
                    c.means, c.cov3d, c.opacity, c.sh, c.upload_time,
                    u2.view, u2.proj, u2.camera_pos, u2.model_scale,
                    u2.time, cfg, num_splats=n)
            proj_probe = (  # noqa: E731
                lambda p: p.cnt.sum().astype(jnp.float32))

            def st_blocks(i, p):
                # defeat loop hoisting on EVERY expensive sub-stage: flip a
                # low bit of both sort keys so the stage-1 row sort, the big
                # selection sorts and everything downstream recompute each
                # iteration (an invariant-input perturbation lets XLA hoist
                # the sorts clean out of the timing loop)
                b = (i & 1).astype(jnp.uint32)
                p = p._replace(key=p.key ^ b, bkey=p.bkey ^ b)
                return build_block_frame2_words(p, cfg)
        else:
            def st_proj(i, op):
                c, u = op
                u2 = u._replace(time=u.time + i.astype(jnp.float32) * 1e-6)
                return project_splats(
                    c.means, c.cov3d, c.opacity, c.sh, c.upload_time,
                    u2.view, u2.proj, u2.camera_pos, u2.model_scale,
                    u2.time, cfg)
            proj_probe = (  # noqa: E731
                lambda p: p.image_pos.ravel()[::65536].sum())

            def st_blocks(i, p):
                p = p._replace(image_pos=p.image_pos
                               + i.astype(jnp.float32) * 1e-7)
                return build_block_frame2(p, cfg, num_splats=n)
        tp = measure(stage_loop(st_proj, proj_probe), (cloud, uni))
        print(f"proj   : {tp*1e3:7.2f} ms", flush=True)

        tb = measure(stage_loop(
            st_blocks,
            lambda o: o[0].payload.ravel()[::65536].sum()
            + o[1].table.ravel()[::4096].sum()), prj)
        print(f"blocks2: {tb*1e3:7.2f} ms", flush=True)

        def st_bin(i, op):
            b, bg = op
            b = b._replace(min_depth=jnp.minimum(
                b.min_depth + i.astype(jnp.uint32), jnp.uint32(0xFFFF)))
            return bin_blocks2(b, cfg), bin_bigs(bg, cfg)
        tn = measure(stage_loop(
            st_bin, lambda o: (o[0].tile_nblocks.sum()
                               + o[1].tile_nbig.sum()).astype(jnp.float32)),
            (bf, bigs))
        print(f"bin2   : {tn*1e3:7.2f} ms", flush=True)

    # --- render (GS_KERNEL=v4 switches to the lockstep kernel) ---------------
    if os.environ.get("GS_KERNEL", "v3") == "v4":
        from godotgaussiansplatting_tpu.ops.render_pallas4 import (
            assemble_image_v4 as asm, render_tiles_v4 as rt)
        kcfg = cfg.replace(kernel="v4")
    else:
        asm, rt, kcfg = assemble_image_v3, render_tiles_v3, cfg

    def st_render(i, op):
        payload, bn, bg = op
        tiles = rt(
            payload, bn, bg, jnp.float32(0.0) + i.astype(jnp.float32)
            * 1e-12, kcfg)
        img, _ = asm(tiles, kcfg)
        return img[::256, ::256, 0].sum()
    tr = measure(stage_loop(st_render, lambda x: x),
                 (bf.payload, bins, tbg), k_hi=5)
    print(f"render : {tr*1e3:7.2f} ms "
          f"({tr/max(blk_pairs,1)*1e9:5.0f} ns/binned pair)", flush=True)


if __name__ == "__main__":
    main()
