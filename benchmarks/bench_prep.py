#!/usr/bin/env python
"""Prep-stage attribution: where blocks2's ~28 ms and binning's ~15 ms go.

Times isolated pieces of build_block_frame2 / bin_blocks2 / bin_bigs on the
headline scene with in-jit fori_loops (bench_v3 rules): the stage-1 variadic
row sort at various operand counts, the big extraction sorts, the feature
build, and the binning L1/L2 sorts + the big table gather.

Usage: python benchmarks/bench_prep.py [n_splats]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_v3 import get_cloud, measure  # noqa: E402


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
    from godotgaussiansplatting_tpu.ops.projection import project_splats
    from godotgaussiansplatting_tpu.ops.blocks2 import (
        build_block_frame2, SUPERBLOCK, _pack_f16)
    from godotgaussiansplatting_tpu.ops.bigbin import bin_bigs
    from godotgaussiansplatting_tpu.ops.binning2 import bin_blocks2

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_800_000
    cfg = gs.RasterizerConfig(width=1920, height=1080, quality="fast")
    cloud = get_cloud(n)
    uni = make_uniforms(gs.orbit_trajectory(1, radius=5.0,
                                            target=(0, 0, 6.0))[0], cfg)
    prj = jax.jit(
        lambda c, u: project_splats(
            c.means, c.cov3d, c.opacity, c.sh, c.upload_time,
            u.view, u.proj, u.camera_pos, u.model_scale, u.time, cfg),
    )(cloud, uni)
    prj = jax.block_until_ready(prj)
    bf, bigs = jax.jit(
        lambda p: build_block_frame2(p, cfg, num_splats=n))(prj)
    bf = jax.block_until_ready(bf)
    bigs = jax.block_until_ready(bigs)
    print("staged", flush=True)

    P = prj.valid.shape[0]
    SB = P // min(SUPERBLOCK, P)
    sbs = P // SB

    def tloop(fn, probe):
        def make(K):
            @jax.jit
            def run(op):
                def body(i, acc):
                    return acc + probe(fn(i, op))
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
            return run
        return make

    def bench(name, fn, probe, op, k_hi=9):
        t0 = time.perf_counter()
        t = measure(tloop(fn, probe), op, k_hi=k_hi)
        print(f"{name:34s}: {t*1e3:7.2f} ms  [{time.perf_counter()-t0:.0f}s]",
              flush=True)
        return t

    # --- stage-1 row sort at operand counts ---------------------------------
    d_sb = prj.depth16.reshape(SB, sbs).astype(jnp.uint32)
    ip = prj.image_pos.reshape(SB, sbs, 2)
    cn = prj.conic.reshape(SB, sbs, 3)
    cl = prj.color.reshape(SB, sbs, 4)
    idx = jnp.arange(P, dtype=jnp.uint32).reshape(SB, sbs)

    def mkops(i, op, k):
        key = (op[0] + i.astype(jnp.uint32))
        full = (key, ip[..., 0], ip[..., 1],
                _pack_f16(cn[..., 0], cn[..., 1]),
                _pack_f16(cn[..., 2], cl[..., 3]),
                _pack_f16(cl[..., 0], cl[..., 1]),
                _pack_f16(cl[..., 2], cl[..., 3]), idx)
        return full[:k]

    probe_first = lambda o: o[0][0, ::4096].sum().astype(jnp.float32)
    for k in (8, 7, 6, 4, 2):
        bench(f"stage1 row sort {k} operands",
              lambda i, op, k=k: jax.lax.sort(
                  mkops(i, op, k), dimension=1, num_keys=1, is_stable=True),
              probe_first, (d_sb,), k_hi=5)

    # --- full blocks2 / binning stages (reference points) -------------------
    def st_blocks(i, p):
        p = p._replace(image_pos=p.image_pos + i.astype(jnp.float32) * 1e-7)
        return build_block_frame2(p, cfg, num_splats=n)
    bench("build_block_frame2 (full)", st_blocks,
          lambda o: o[0].payload.ravel()[::65536].sum()
          + o[1].table.ravel()[::4096].sum(), prj, k_hi=5)

    def st_bin(i, b):
        b = b._replace(min_depth=jnp.minimum(
            b.min_depth + i.astype(jnp.uint32), jnp.uint32(0xFFFF)))
        return bin_blocks2(b, cfg)
    bench("bin_blocks2 (full)", st_bin,
          lambda o: o.tile_nblocks.sum().astype(jnp.float32), bf, k_hi=5)

    def st_bigs(i, bg):
        bg = bg._replace(depth16=jnp.minimum(
            bg.depth16 + i.astype(jnp.uint32), jnp.uint32(0xFFFF)))
        return bin_bigs(bg, cfg)
    bench("bin_bigs (full)", st_bigs,
          lambda o: o.tile_nbig.sum().astype(jnp.float32), bigs, k_hi=5)

    # --- bin_bigs pieces: L2 sort vs table gather ---------------------------
    from godotgaussiansplatting_tpu.ops.binning2 import SUPER
    gx, gy = cfg.tile_dims
    sgx, sgy = -(-gx // SUPER), -(-gy // SUPER)
    NS = sgx * sgy
    C1b = min(2048, bigs.table.shape[0])
    key2 = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 1 << 27, (NS, 64, C1b), dtype=np.uint32))
    bench("bigbin L2 sort (NS,64,C1) alone",
          lambda i, k: jax.lax.sort((k + i.astype(jnp.uint32),),
                                    dimension=2, num_keys=1,
                                    is_stable=True)[0],
          lambda o: o[0, 0, ::512].sum().astype(jnp.float32),
          key2, k_hi=5)

    T = gx * gy
    sel = jnp.asarray(np.random.default_rng(1).integers(
        0, bigs.table.shape[0], (T, 128), dtype=np.int32))
    bench("big table gather (T,128,PW)",
          lambda i, op: op[0][(op[1] + i) % op[0].shape[0]].transpose(0, 2, 1),
          lambda o: o.ravel()[::65536].sum(),
          (bigs.table, sel.reshape(-1)), k_hi=5)


if __name__ == "__main__":
    main()
