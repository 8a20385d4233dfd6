#!/usr/bin/env python
"""Micro-attribution of the render-prep stage (p_prep delta = 42.8 ms).

Times each prep component in isolation under an in-jit loop:
  pack_rows   pack_tile_rows_v3
  bigla       prepass_big_la (the batched big-lane eval)
  bigla_flat  restructured: ONE (NPX, 8) @ (8, TG*OBIG) matmul + transpose
  slab        the slab gather + transpose

Usage: python benchmarks/micro_prep.py [n_splats]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
    from godotgaussiansplatting_tpu.ops.projection import project_splats
    from godotgaussiansplatting_tpu.ops.blocks2 import (
        build_block_frame2, BLOCK_SIZE, PAYLOAD_WIDTH, GATE_OFF)
    from godotgaussiansplatting_tpu.ops.binning2 import bin_blocks2
    from godotgaussiansplatting_tpu.ops.bigbin import bin_bigs
    from godotgaussiansplatting_tpu.ops.render_pallas3 import (
        pack_tile_rows_v3, prepass_big_la, ALPHA_MAX, _group_pixel_coords)
    from bench_v3 import get_cloud, measure

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_800_000
    cfg = gs.RasterizerConfig(width=1920, height=1080, quality="fast")
    cloud = get_cloud(n)
    import dataclasses
    cloud = dataclasses.replace(cloud, sh=cloud.sh.astype(jnp.bfloat16))
    uni = make_uniforms(gs.orbit_trajectory(1, radius=5.0,
                                            target=(0, 0, 6.0))[0], cfg)
    prj = jax.jit(lambda c, u: project_splats(
        c.means, c.cov3d, c.opacity, c.sh, c.upload_time,
        u.view, u.proj, u.camera_pos, u.model_scale, u.time, cfg))(cloud, uni)
    bf, bigs = jax.jit(
        lambda p: build_block_frame2(p, cfg, num_splats=n))(prj)
    bins = jax.jit(lambda b: bin_blocks2(b, cfg))(bf)
    tbg = jax.jit(lambda b: bin_bigs(b, cfg))(bigs)
    jax.block_until_ready(tbg.bigpay)
    print("scene staged", flush=True)

    def loop(body_fn):
        def make(K):
            @jax.jit
            def run(op):
                def body(i, acc):
                    return acc + body_fn(i, op)
                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))
            return run
        return make

    # --- pack_rows ---------------------------------------------------------
    def f_pack(i, op):
        b, t = op
        rows = pack_tile_rows_v3(b.tile_blocks, b.tile_nblocks,
                                 t.tile_nbig, b.tile_minmax,
                                 b.tile_candidates,
                                 jnp.float32(0) + i.astype(jnp.float32)
                                 * 1e-9, cfg)
        return rows.ravel()[::4096].sum().astype(jnp.float32)
    t = measure(loop(f_pack), (bins, tbg), k_hi=9)
    print(f"pack_rows  : {t*1e3:7.2f} ms", flush=True)

    # --- bigla (current) ---------------------------------------------------
    def f_bigla(i, op):
        bp = op.bigpay + i.astype(jnp.float32) * 1e-12
        la = prepass_big_la(op._replace(bigpay=bp).bigpay
                            if False else bp, cfg, lowp=True)
        return la.ravel()[::65536].sum().astype(jnp.float32)
    t = measure(loop(f_bigla), tbg, k_hi=5)
    print(f"bigla      : {t*1e3:7.2f} ms", flush=True)

    # --- bigla_flat (restructured single matmul) ----------------------------
    from godotgaussiansplatting_tpu.ops.bigbin import GROUP

    def prepass_flat(bigpay, precision):
        f32 = jnp.float32
        gx, _ = cfg.tile_dims
        gx2 = -(-gx // GROUP)
        ts = float(cfg.tile_size)
        TG, PW, OB = bigpay.shape
        t_ = jnp.arange(TG, dtype=jnp.int32)
        ox = (jax.lax.rem(t_, gx2) * (GROUP * cfg.tile_size)
              ).astype(f32)[:, None]
        oy = ((t_ // gx2) * cfg.tile_size).astype(f32)[:, None]
        pay = bigpay.astype(f32)
        dx = ox - pay[:, 14]
        dy = oy - pay[:, 15]
        f0u = (pay[:, 0] + dx * pay[:, 1] + dy * pay[:, 2]
               + dx * dx * pay[:, 3] + dy * dy * pay[:, 4]
               + dx * dy * pay[:, 5])
        f1u = pay[:, 1] + 2.0 * dx * pay[:, 3] + dy * pay[:, 5]
        f2u = pay[:, 2] + 2.0 * dy * pay[:, 4] + dx * pay[:, 5]
        rw = jax.lax.bitcast_convert_type(pay[:, 11], jnp.uint32)
        rxw = jax.lax.bitcast_convert_type(
            (rw & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(f32)
        ryw = jax.lax.bitcast_convert_type(
            (rw >> 16).astype(jnp.uint16), jnp.bfloat16).astype(f32)
        ixr, iyr = pay[:, 9], pay[:, 10]
        covered = ((ixr - rxw < ox + GROUP * ts) & (ixr + rxw > ox)
                   & (iyr - ryw < oy + ts) & (iyr + ryw > oy))
        gate = jnp.where(covered, 0.0, GATE_OFF)
        F = jnp.stack([f0u, f1u, f2u, pay[:, 3], pay[:, 4], pay[:, 5],
                       gate, jnp.zeros_like(gate)], axis=1)  # (TG, 8, OB)
        # flatten: (8, TG*OB) then ONE matmul
        F2 = F.transpose(1, 0, 2).reshape(8, TG * OB)
        xs, ys = _group_pixel_coords(cfg)
        ones = np.ones_like(xs)
        pixf = jnp.asarray(np.stack(
            [ones, xs, ys, xs * xs, ys * ys, xs * ys, ones,
             np.zeros_like(xs)], axis=1))                    # (NPX, 8)
        P = jax.lax.dot_general(pixf, F2, (((1,), (0,)), ((), ())),
                                precision=precision)          # (NPX, TG*OB)
        alpha = jnp.minimum(jnp.exp(P), ALPHA_MAX)
        la = jnp.log1p(-alpha).astype(jnp.bfloat16)
        NPX = cfg.tile_size * cfg.tile_size
        return la.reshape(NPX, TG, OB).transpose(1, 0, 2)    # (TG, NPX, OB)

    for prec in ["highest", "high"]:
        def f_flat(i, op, prec=prec):
            bp = op.bigpay + i.astype(jnp.float32) * 1e-12
            la = prepass_flat(bp, prec)
            return la.ravel()[::65536].sum().astype(jnp.float32)
        t = measure(loop(f_flat), tbg, k_hi=5)
        print(f"bigla_flat({prec}): {t*1e3:7.2f} ms", flush=True)

    # numeric check flat vs current
    la0 = jax.jit(lambda b: prepass_big_la(b, cfg, lowp=True))(tbg.bigpay)
    la1 = jax.jit(lambda b: prepass_flat(b, "highest"))(tbg.bigpay)
    d = np.abs(np.asarray(la0, np.float32) - np.asarray(la1, np.float32))
    print(f"flat-vs-current max abs diff: {d.max():.3e}", flush=True)

    # --- slab gather --------------------------------------------------------
    slab_u, Un = cfg.slab_u, 4
    Wb = slab_u * Un
    TG = bins.tile_blocks.shape[0]

    def f_slab(i, op):
        payload, tb = op
        ids = jnp.maximum(tb[:, :Wb], 0).astype(jnp.int32) + 0 * i
        slab = payload[ids.reshape(-1)]
        slab = slab.reshape(TG, Wb, PAYLOAD_WIDTH, BLOCK_SIZE)
        slab = slab.transpose(0, 2, 1, 3).reshape(
            TG, PAYLOAD_WIDTH, Wb * BLOCK_SIZE)
        return slab.ravel()[::65536].sum()
    t = measure(loop(f_slab), (bf.payload, bins.tile_blocks), k_hi=5)
    print(f"slab       : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
