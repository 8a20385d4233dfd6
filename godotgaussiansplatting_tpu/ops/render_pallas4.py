"""Pallas TPU render kernel v4: GT tiles composited in LOCKSTEP per grid step.

Same ordering semantics as v3 (ops/render_pallas3.py: batch-exact
compositing via depth-indicator matmuls over packed (depth16, idx) ranks,
gated lag-1 corrections, resident exactly-sorted big lanes, batch-granular
saturation exit) — restructured for the measured v3 bottleneck: the kernel
is MXU-LATENCY-bound (~2.5 us per 512-lane batch over a handful of small
dependent matmuls) on a sequential 8160-step grid with ~3.8 us/tile of
fixed cost, while early exit leaves only ~2 live batches per tile.

v4 processes GT=4 tiles per grid step IN LOCKSTEP: one batch = U blocks
from EACH tile's list = GT*U*S lanes. What amortizes across the group:

  * ONE power matmul (NPX, 16+) @ (16+, GT*U*S) — tile-LOCAL pixel
    features are identical for every tile, so one MXU issue evaluates all
    GT tiles' blocks at their own pixels (per-lane feature re-centering
    carries the per-tile origin);
  * the per-tile ordering / correction / exchange matmuls are INDEPENDENT
    across tiles and issue back-to-back (the systolic array pipelines
    them, hiding GT-1 of every GT latencies);
  * ONE grid step, one rows DMA, one auto-pipelined big-lane fetch, one
    out write per GT tiles.

Per-LANE work (exp/log1p, pend stores) does not amortize — it scales with
tiles — so the expected win is the latency + fixed-cost share (~40% at
the 5.8M/1080p headline per the round-3 ablation attribution).

Big lanes are UNIFIED along lanes: per step the GT tiles' per-tile lists
(ops/bigbin.py, GROUP=1) concatenate into (NPX, GT*OBIG) maps; intra-big
prefix ordering is ONE matmul against a static block-diagonal strict-lower
triangle. The chain slab (XLA-pre-gathered first slab_u batches, lanes
pre-arranged [tile0 U blocks | tile1 ... ]) removes per-block DMA for the
batches early exit leaves live; deeper groups fall through to a GT*U-wide
DMA ring.

Selected with RasterizerConfig(kernel="v4"); bit-compatible envelope with
v3 (same +-1-batch exactness window per tile, same big-lane semantics).
Reference parity anchor: gsplat_render.glsl (one workgroup per tile,
globally sorted traversal) — v4 is the TPU-shaped equivalent of running
4 workgroups per sequential grid slot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RasterizerConfig
from .blocks2 import BLOCK_SIZE, DEPTH_INVALID, GATE_OFF, PAYLOAD_WIDTH
from .render_pallas3 import (ALPHA_MAX, LOG_MIN_ALPHA, OUT_CH,
                             default_batch_u, fexp, fln_one_minus,
                             pack_tile_rows_v3)

import os as _os

# Tiles per lockstep grid step come from RasterizerConfig.lockstep_gt
# (4 amortizes MXU latency 4x at ~11 MB VMEM scratch; 2 halves VMEM
# pressure). The GS_GT env var overrides it for benchmark sweeps only,
# read at trace time in render_tiles_v4.


def _render_kernel_v4(
    rows_hbm,        # (T4, GT*8, 128) i32 ANY — per-tile 8-row sections
    payload_hbm,     # (B, PW, S) f32 ANY — chain payload (ring tail)
    bigpay_ref,      # (1, PW, GT*OBIG) f32 VMEM — unified big payloads
    bigla_ref,       # (1, NPX, GT*OBIG) cdt VMEM — unified big la maps
    slab_ref,        # (1, slab_u, PW, L) f32 VMEM — pre-arranged first
                     # slab_u lockstep batches (dummy when slab_u == 0)
    pixf_cat_ref,    # (NPX, 16|24) bf16 VMEM — fused hi/lo pixel features
    lt_diag_ref,     # (GT*OBIG, GT*OBIG) cdt VMEM — block-diagonal strict
                     # lower triangle (per-tile big segments)
    out_ref,         # (1, GT*NPX, OUT_CH) f32
    row_smem,        # SMEM (2, GT*8, 128) i32
    meta,            # SMEM (5*GT,) i32 — per tile: [prev_bmin, prev_bmax,
                     # bucket_lo, bucket_hi, exit_flag] at [5g..5g+5)
    kxit,            # SMEM (GT,) i32 — last live batch index + 1 (diag)
    pay_vmem,        # VMEM (2, PW, L) f32 — chain ring (GT*U block slots)
    pend_z,          # VMEM (2, NPX, L) f32
    pend_c,          # VMEM (2, NPX, GT) f32 — per-tile carry columns
    pend_la,         # VMEM (2, NPX, L) cdt
    pend_al,         # VMEM (2, NPX, L) bf16
    pend_rgb,        # VMEM (2, 4, L) bf16
    pend_w,          # VMEM (2, 1, L) i32
    big_z,           # VMEM (NPX, GT*OBIG) f32
    big_rgb,         # VMEM (4, GT*OBIG) bf16
    big_d,           # VMEM (1, GT*OBIG) f32
    big_w,           # VMEM (1, GT*OBIG) i32
    acc,             # VMEM (NPX, 4*GT) f32 — rgba per tile column groups
    tvals,           # VMEM (NPX, 2*GT) f32 — [tcar_g | bigtot_g] columns
    row_sems,        # DMA sems (2,)
    sems,            # DMA sems (2, GT, U)
    *, gx: int, tile_size: int, num_groups: int, early_exit: bool,
    lowp: bool, max_batches: int, obig: int, U: int, gt: int,
    slab_u: int = 0, ablate: str = "",
):
    GT = gt
    S = BLOCK_SIZE
    US = U * S
    L = GT * US
    GTOB = GT * obig
    NPX = tile_size * tile_size
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    cdt = bf16 if lowp else f32
    t = pl.program_id(0)
    slot_r = jax.lax.rem(t, 2)
    tsz = float(tile_size)

    def srow(pos, base, slot, g):
        k = pos + base * 128
        return row_smem[slot, g * 8 + k // 128, jax.lax.rem(k, 128)]

    def block_id(pos, slot, g):
        return srow(pos, 1, slot, g) & 0x7FFFFF

    def block_mm(pos, g):
        w = srow(pos, 3, slot_r, g)
        return (w >> 16) & 0xFFFF, w & 0xFFFF

    # --- rows double buffering (bigpay/bigla/slab are auto-pipelined) -------
    @pl.when(t == 0)
    def _():
        pay_vmem[...] = jnp.zeros((2, PAYLOAD_WIDTH, L), f32)
        pltpu.make_async_copy(rows_hbm.at[0], row_smem.at[0],
                              row_sems.at[0]).start()
        pltpu.make_async_copy(rows_hbm.at[0], row_smem.at[0],
                              row_sems.at[0]).wait()
    @pl.when(t > 0)
    def _():
        # pair the start issued at step t-1 for THIS slot: the wait must
        # happen before nb/header reads below (hardware DMAs are async;
        # interpret mode completes them inline and hides a missing wait)
        pltpu.make_async_copy(rows_hbm.at[t], row_smem.at[slot_r],
                              row_sems.at[slot_r]).wait()
    @pl.when(t + 1 < num_groups)
    def _():
        pltpu.make_async_copy(rows_hbm.at[t + 1], row_smem.at[1 - slot_r],
                              row_sems.at[1 - slot_r]).start()

    nb = [row_smem[slot_r, g * 8, 0] for g in range(GT)]
    if "noloop" in ablate:
        nb = [n * 0 for n in nb]
    nbig = [row_smem[slot_r, g * 8, 4] for g in range(GT)]
    if "bigpre" in ablate or "nobigdma" in ablate:
        nbig = [n * 0 for n in nbig]
    has_big = [n > 0 for n in nbig]
    any_big = has_big[0]
    for g in range(1, GT):
        any_big = any_big | has_big[g]
    hm_f = [row_smem[slot_r, g * 8, 2].astype(f32) * (1.0 / 65536.0)
            for g in range(GT)]
    y_off = row_smem[slot_r, 0, 3]

    # per-tile pixel origins -> per-lane (1, L) origin vectors
    seg = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) // US
    tile_ids = [t * GT + g for g in range(GT)]
    ox_vec = jnp.zeros((1, L), f32)
    oy_vec = jnp.zeros((1, L), f32)
    tx = []
    ty = []
    for g in range(GT):
        txg = (jax.lax.rem(tile_ids[g], gx) * tile_size).astype(f32)
        tyg = ((tile_ids[g] // gx) * tile_size + y_off).astype(f32)
        tx.append(txg)
        ty.append(tyg)
        ox_vec = jnp.where(seg == g, txg, ox_vec)
        oy_vec = jnp.where(seg == g, tyg, oy_vec)

    def eval_payload(pay, live, ox, oy):
        """See render_pallas3.eval_payload — ox/oy are (1, L) per-lane
        tile-origin vectors here (lockstep tiles differ per segment)."""
        f0, f1, f2 = pay[0:1, :], pay[1:2, :], pay[2:3, :]
        f3, f4, f5 = pay[3:4, :], pay[4:5, :], pay[5:6, :]
        dx = ox - pay[14:15, :]
        dy = oy - pay[15:16, :]
        f0u = f0 + dx * f1 + dy * f2 + dx * dx * f3 + dy * dy * f4 \
            + dx * dy * f5
        f1u = f1 + 2.0 * dx * f3 + dy * f5
        f2u = f2 + 2.0 * dy * f4 + dx * f5
        ixr, iyr = pay[9:10, :], pay[10:11, :]
        rw = jax.lax.bitcast_convert_type(pay[11:12, :], jnp.uint32)
        rxw = jax.lax.bitcast_convert_type(
            (rw & 0xFFFF).astype(jnp.uint16), bf16).astype(f32)
        ryw = jax.lax.bitcast_convert_type(
            (rw >> 16).astype(jnp.uint16), bf16).astype(f32)
        covered = ((ixr - rxw < ox + tsz) & (ixr + rxw > ox)
                   & (iyr - ryw < oy + tsz) & (iyr + ryw > oy))
        gate = jnp.where(covered & live, 0.0, GATE_OFF)
        z1 = jnp.zeros((1, pay.shape[1]), f32)
        F = jnp.concatenate([f0u, f1u, f2u, f3, f4, f5, gate, z1],
                            axis=0)                             # (8, L)
        rgbT = pay[6:9, :].astype(bf16)
        return F, rgbT, jax.lax.bitcast_convert_type(
            pay[12:13, :], jnp.int32)

    def w_front(wA, wB):
        return (wA < wB).astype(cdt)

    pixf_cat = pixf_cat_ref[...]
    three = pixf_cat.shape[1] == 24

    # identical fast-transcendental selection to v3 (bit-equality
    # between the kernels is a test invariant)
    # builtins on both paths — hardware transcendentals measured 2.5x the
    # poly rate on v5e (see render_pallas3.py + benchmarks/vpu_probe.py)
    k_exp = jnp.exp
    k_ln1m = lambda a: jnp.log1p(-a)  # noqa: E731

    def mm_power(F_all):
        Fh = F_all.astype(bf16)
        Fl = (F_all - Fh.astype(f32)).astype(bf16)
        parts = [Fh, Fl] + ([Fh] if three else [])
        P = jax.lax.dot_general(
            pixf_cat, jnp.concatenate(parts, axis=0),
            (((1,), (0,)), ((), ())), preferred_element_type=f32)
        alpha = jnp.minimum(k_exp(P), ALPHA_MAX)
        return alpha, k_ln1m(alpha)

    # --- init per-step state -------------------------------------------------
    acc[...] = jnp.zeros((NPX, 4 * GT), f32)
    tvals[...] = jnp.zeros((NPX, 2 * GT), f32)

    # --- unified big pre-pass ------------------------------------------------
    # lanes of tiles with nbig_g == 0 were sanitized upstream (gate row
    # GATE_OFF -> la = 0), so the unified matmul is safe regardless
    @pl.when(any_big)
    def _():
        lac = bigla_ref[0]                                   # (NPX, GTOB)
        big_z[...] = jax.lax.dot_general(
            lac, lt_diag_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        pay = bigpay_ref[0]
        big_rgb[...] = jnp.concatenate(
            [pay[6:9, :].astype(bf16), jnp.zeros((1, GTOB), bf16)], axis=0)
        d_row = pay[12:13, :]
        i_row = jax.lax.bitcast_convert_type(pay[13:14, :], jnp.int32)
        d_i = jnp.minimum(d_row, 65535.0).astype(jnp.int32)
        big_d[...] = d_row
        big_w[...] = ((d_i << 16) | ((i_row >> 7) & 0xFFFF)) ^ jnp.int32(
            -0x80000000)
        # per-tile big totals
        lacf = lac.astype(f32)
        for g in range(GT):
            bsl = slice(g * obig, (g + 1) * obig)
            tvals[:, GT + g:GT + g + 1] = jnp.sum(
                lacf[:, bsl], axis=1, keepdims=True)
        # (straddle gates read each tile's big depth-bucket PREFIX — header
        # row 5, built in bin_bigs — with scalar SMEM reads per batch; the
        # old 32-bucket occupancy masks fired near-always at headline
        # density. Classification matches v3 exactly, preserving bit parity)

    # --- chain stream ---------------------------------------------------------
    def start_batch(k, slot_idx):
        for g in range(GT):
            for u in range(U):
                pos = k * U + u
                @pl.when(pos < nb[g])
                def _(g=g, u=u, pos=pos):
                    pltpu.make_async_copy(
                        payload_hbm.at[block_id(pos, slot_r, g)],
                        pay_vmem.at[slot_idx, :,
                                    pl.ds(g * US + u * S, S)],
                        sems.at[slot_idx, g, u]).start()

    def wait_batch(k, slot_idx):
        for g in range(GT):
            for u in range(U):
                pos = k * U + u
                @pl.when(pos < nb[g])
                def _(g=g, u=u, pos=pos):
                    pltpu.make_async_copy(
                        payload_hbm.at[0],
                        pay_vmem.at[slot_idx, :,
                                    pl.ds(g * US + u * S, S)],
                        sems.at[slot_idx, g, u]).wait()

    def emit_tile(g, la_b, z, rgbT4, al, zc):
        """acc[:, 4g:4g+4] += (al * exp(z + zc)) @ rgb — per-tile segment."""
        w = (k_exp(z + zc) * al.astype(f32)).astype(bf16)  # (NPX, US)
        acc[:, 4 * g:4 * g + 4] += jax.lax.dot_general(
            w, rgbT4, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    lane_blk = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (1, L), 1), US) // S
    nb_vec = jnp.zeros((1, L), jnp.int32)
    for g in range(GT):
        nb_vec = jnp.where(seg == g, nb[g], nb_vec)

    def live_flag(g):
        return meta[5 * g + 4] != 0

    def batch_body(k, pay_all):
        grp = jax.lax.rem(k, 2)
        sc, sp = grp, 1 - grp

        # per-lane live mask: block in range AND tile not exited
        lv = lane_blk < (nb_vec - k * U)
        if early_exit:
            fv = jnp.zeros((1, L), jnp.int32)
            for g in range(GT):
                fv = jnp.where(seg == g, meta[5 * g + 4], fv)
            lv = lv & (fv != 0)

        F_all, rgbT, w_cur = eval_payload(pay_all, lv, ox_vec, oy_vec)
        if "eval" in ablate:
            la = jnp.full((NPX, L), -0.01, f32)
            al = jnp.full((NPX, L), 0.00995, f32)
        else:
            al, la = mm_power(F_all)                         # (NPX, L)
        lac = la.astype(cdt)

        pend_la[sc] = lac
        pend_al[sc] = al.astype(bf16)
        pend_rgb[sc] = jnp.concatenate(
            [rgbT, jnp.zeros((1, L), bf16)], axis=0)
        pend_w[sc] = w_cur

        d_big = big_d[...]
        w_big = big_w[...]
        for g in range(GT):
            sl = slice(g * US, (g + 1) * US)
            bsl = slice(g * obig, (g + 1) * obig)
            live_g = (k * U < nb[g])
            if early_exit:
                live_g = live_g & live_flag(g)

            bmin = jnp.int32(0x10000)
            bmax = jnp.int32(-1)
            for u in range(U):
                pos = k * U + u
                mn, mx = block_mm(pos, g)
                ok = pos < nb[g]
                bmin = jnp.where(ok, jnp.minimum(bmin, mn), bmin)
                bmax = jnp.where(ok, jnp.maximum(bmax, mx), bmax)
            bminf = bmin.astype(f32)
            bmaxf = bmax.astype(f32)

            w_g = w_cur[:, sl]                               # (1, US)
            lac_g = lac[:, sl]
            if "cums" in ablate:
                cums_g = jnp.zeros((NPX, US), f32)
            else:
                M_g = w_front(w_g.reshape(US, 1), w_g)
                cums_g = jax.lax.dot_general(
                    lac_g, M_g, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
            pend_z[sc, :, sl] = cums_g
            pend_c[sc, :, g:g + 1] = tvals[:, g:g + 1]

            # chain <-> big exchange (per-tile, v3 semantics); straddle
            # gate off the per-tile big depth-bucket PREFIX (header row 5,
            # 512-depth16 buckets — identical classification to v3)
            b0 = jnp.clip(bmin >> 9, 0, 127)
            b1 = jnp.clip(bmax >> 9, 0, 127)
            n_hi = row_smem[slot_r, g * 8 + 5, b1]
            n_lo = jnp.where(
                b0 > 0, row_smem[slot_r, g * 8 + 5,
                                 jnp.maximum(b0 - 1, 0)], 0)
            strad = live_g & has_big[g] & (bmax >= bmin) & (
                n_hi - n_lo != 0)
            if "bigx" in ablate:
                strad = strad & (nb[g] < 0)
                has_big_x = has_big[g] & (nb[g] < 0)
            else:
                has_big_x = live_g & has_big[g]
            tot_g = jnp.sum(la[:, sl], axis=1, keepdims=True)  # (NPX, 1)
            # big mass certainly in front of this batch — shared by the
            # disjoint exchange add and the exit metric (one reduce)
            bfm_g = jnp.sum(bigla_ref[0, :, bsl].astype(f32)
                            * (d_big[:, bsl] < bminf),
                            axis=1, keepdims=True)            # (NPX, 1)

            @pl.when(strad)
            def _(g=g, sl=sl, bsl=bsl, w_g=w_g, lac_g=lac_g):
                w_bc = big_w[:, bsl]
                mask_bc = w_front(w_bc.reshape(obig, 1), w_g)
                pend_z[sc, :, sl] += jax.lax.dot_general(
                    bigla_ref[0, :, bsl], mask_bc,
                    (((1,), (0,)), ((), ())), preferred_element_type=f32)
                mask_cb = w_front(w_g.reshape(US, 1), w_bc)  # (US, OBIG)
                big_z[:, bsl] += jax.lax.dot_general(
                    lac_g, mask_cb, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
            @pl.when(has_big_x & ~strad)
            def _(g=g, bsl=bsl, tot_g=tot_g, bfm_g=bfm_g, bmaxf=bmaxf):
                pend_c[sc, :, g:g + 1] += bfm_g
                big_z[:, bsl] += tot_g * (d_big[:, bsl] > bmaxf).astype(f32)

            # lag-1 corrections (per-tile gating, v3 semantics)
            ovl = live_g & (k > 0) & (bmin <= meta[5 * g + 1]) \
                & (bmax >= meta[5 * g + 0])
            if "corr" in ablate:
                ovl = ovl & (nb[g] < 0)
            @pl.when(ovl)
            def _(g=g, sl=sl, w_g=w_g, lac_g=lac_g):
                w_p = pend_w[sp, :, sl]
                mf = w_front(w_g.reshape(US, 1), w_p)
                pend_z[sp, :, sl] += jax.lax.dot_general(
                    lac_g, mf, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                mb = 1.0 - w_front(w_p.reshape(US, 1), w_g)
                pend_z[sc, :, sl] -= jax.lax.dot_general(
                    pend_la[sp, :, sl], mb, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)

            if "emit" not in ablate:
                @pl.when(k > 0)
                def _(g=g, sl=sl):
                    emit_tile(g, pend_la[sp, :, sl], pend_z[sp, :, sl],
                              pend_rgb[sp, :, sl], pend_al[sp, :, sl],
                              pend_c[sp, :, g:g + 1])

            tcar = tvals[:, g:g + 1] + tot_g
            tvals[:, g:g + 1] = tcar
            if early_exit:
                bexit = jnp.where(has_big[g], bfm_g,
                                  jnp.zeros((NPX, 1), f32))
                alive = (jnp.max(tcar + bexit)
                         > LOG_MIN_ALPHA).astype(jnp.int32)
                meta[5 * g + 4] = jnp.where(live_flag(g), alive, 0)
            @pl.when(live_g)
            def _(g=g):
                kxit[g] = k + 1
            meta[5 * g + 0] = bmin
            meta[5 * g + 1] = bmax

    def cond(k):
        go = k < max_batches
        anyl = (k * U < nb[0]) & live_flag(0) if early_exit \
            else (k * U < nb[0])
        for g in range(1, GT):
            lg = (k * U < nb[g])
            if early_exit:
                lg = lg & live_flag(g)
            anyl = anyl | lg
        return go & anyl

    def body(k):
        wait_batch(k, jax.lax.rem(k, 2))
        start_batch(k + 1, jax.lax.rem(k + 1, 2))
        batch_body(k, pay_vmem[jax.lax.rem(k, 2)])
        return k + 1

    for g in range(GT):
        if early_exit:
            meta[5 * g + 4] = jnp.int32(1)
        kxit[g] = jnp.int32(0)

    if "pend" in ablate or "emit" in ablate:
        pass  # flags accepted for parity; v4 always stores pend state

    k0 = jnp.int32(0)
    for kk in range(slab_u):
        go_k = cond(jnp.int32(kk))
        @pl.when(go_k)
        def _(kk=kk):
            batch_body(jnp.int32(kk), slab_ref[0, kk])
        k0 = jnp.where(go_k, jnp.int32(kk + 1), k0)

    ring_go = cond(k0)
    @pl.when(ring_go)
    def _():
        start_batch(k0, jax.lax.rem(k0, 2))
    k_end = jax.lax.while_loop(cond, body, k0)
    @pl.when(ring_go)
    def _():
        wait_batch(k_end, jax.lax.rem(k_end, 2))

    # trailing emits: the last stored batch, then the resident bigs
    if "emit" not in ablate:
        @pl.when(k_end > 0)
        def _():
            sp = jax.lax.rem(k_end - 1, 2)
            for g in range(GT):
                sl = slice(g * US, (g + 1) * US)
                emit_tile(g, pend_la[sp, :, sl], pend_z[sp, :, sl],
                          pend_rgb[sp, :, sl], pend_al[sp, :, sl],
                          pend_c[sp, :, g:g + 1])
    for g in range(GT):
        @pl.when(has_big[g])
        def _(g=g):
            bsl = slice(g * obig, (g + 1) * obig)
            laf = bigla_ref[0, :, bsl].astype(f32)
            z = big_z[:, bsl]
            w = (k_exp(z) - k_exp(z + laf)).astype(bf16)
            acc[:, 4 * g:4 * g + 4] += jax.lax.dot_general(
                w, big_rgb[:, bsl], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)

    # --- present per tile -----------------------------------------------------
    ch = jax.lax.broadcasted_iota(jnp.int32, (NPX, OUT_CH), 1)
    for g in range(GT):
        t_exp = tvals[:, g:g + 1] + jnp.where(
            has_big[g], tvals[:, GT + g:GT + g + 1],
            jnp.zeros((NPX, 1), f32))
        t_final = jnp.exp(t_exp)
        mixf = row_smem[slot_r, g * 8, 1].astype(f32) * 5e-4
        cov = (1.0 - t_final) * hm_f[g]
        hm = jnp.where(ch == 0, 1.0 * mixf,
                       jnp.where(ch == 1, 0.2 * mixf,
                                 jnp.where(ch == 2, 1.0 - 0.8 * mixf,
                                           0.0))) * cov
        a4 = acc[:, 4 * g:4 * g + 4]
        out = jnp.concatenate(
            [a4[:, 0:3], jnp.zeros((NPX, OUT_CH - 3), f32)], axis=1) + hm
        out = jnp.where(ch == 3, 1.0, out)
        out = jnp.where(ch == 4, t_final, out)
        proc = jnp.minimum(kxit[g] * U, nb[g]).astype(f32)
        out = jnp.where(ch == 5, proc, out)
        out = jnp.where(ch == 6, nb[g].astype(f32), out)
        out = jnp.where(ch == 7, nbig[g].astype(f32), out)
        out_ref[0, pl.ds(g * NPX, NPX), :] = out


def render_tiles_v4(
    payload: jnp.ndarray,          # (B, PW, S) f32
    bins,                          # TileBins2 (per true tile)
    tile_bigs,                     # TileBigs (ops/bigbin.py, GROUP=1)
    heatmap_factor: jnp.ndarray,   # () f32
    cfg: RasterizerConfig,
    early_exit: bool = True,
    lowp: bool = True,
    interpret: bool = False,
    pixel_offset_y=0,
    batch_u: int | None = None,
    slab_u: int | None = None,
    ablate: str | None = None,
):
    """Launch the v4 lockstep kernel -> (T4, GT*NPX, OUT_CH); unpack with
    assemble_image_v4 / tile_channels_v4. Upstream stages are IDENTICAL to
    v3's (bigbin GROUP=1 per-tile lists); only the launch layout differs."""
    from .bigbin import GROUP
    assert GROUP == 1, "v4 lockstep requires per-tile big lists (GROUP=1)"
    import os as _os
    GT = (int(_os.environ["GS_GT"]) if "GS_GT" in _os.environ  # sweeps only
          else cfg.lockstep_gt)
    gx, gy = cfg.tile_dims
    T = gx * gy
    T4 = -(-T // GT)
    NPX = cfg.tile_size * cfg.tile_size
    if jax.default_backend() == "cpu":
        interpret = True

    obig = tile_bigs.bigpay.shape[2]
    if batch_u is None:
        if "GS_BATCH_U" in _os.environ:     # benchmark sweep override only
            batch_u = int(_os.environ["GS_BATCH_U"])
        else:
            batch_u = cfg.batch_u or default_batch_u(cfg.tile_size)
    Un = batch_u
    US = Un * BLOCK_SIZE
    L = GT * US
    C2 = bins.tile_blocks.shape[1]
    max_batches = -(-C2 // Un)
    cdt = jnp.bfloat16 if lowp else jnp.float32
    if ablate is None:
        ablate = _os.environ.get("GS_KERNEL_ABLATE", "")
        if ablate:
            import warnings
            warnings.warn(
                f"GS_KERNEL_ABLATE={ablate!r}: kernel stages STRIPPED.",
                RuntimeWarning, stacklevel=2)

    rows = pack_tile_rows_v3(bins.tile_blocks, bins.tile_nblocks,
                             tile_bigs.tile_nbig, bins.tile_minmax,
                             bins.tile_candidates, heatmap_factor, cfg,
                             pixel_offset_y)          # (T, 8, 128) @GROUP=1

    def padt(a):
        return jnp.pad(a, ((0, T4 * GT - T),) + ((0, 0),) * (a.ndim - 1))

    rows4 = padt(rows).reshape(T4, GT * 8, 128)
    # unified big lanes: (T, PW, OBIG) -> (T4, PW, GT*OBIG)
    bp = padt(tile_bigs.bigpay).reshape(T4, GT, PAYLOAD_WIDTH, obig)
    bigpay4 = bp.transpose(0, 2, 1, 3).reshape(T4, PAYLOAD_WIDTH,
                                               GT * obig)
    from .render_pallas3 import prepass_big_la
    bigla = prepass_big_la(tile_bigs.bigpay, cfg, lowp=lowp,
                           pixel_offset_y=pixel_offset_y)  # (T, NPX, OBIG)
    bl = padt(bigla).reshape(T4, GT, NPX, obig)
    bigla4 = bl.transpose(0, 2, 1, 3).reshape(T4, NPX, GT * obig)

    # chain slab, lanes pre-arranged [t0: U blocks | t1 ... ] per batch
    if slab_u is None:
        if "GS_SLAB_U" in _os.environ:      # benchmark sweep override only
            slab_u = int(_os.environ["GS_SLAB_U"])
        else:
            slab_u = cfg.slab_u
    slab_u = min(slab_u, C2 // Un)
    if slab_u > 0:
        Wb = slab_u * Un
        ids = padt(jnp.maximum(bins.tile_blocks[:, :Wb], 0)
                   .astype(jnp.int32))                   # (T4*GT, Wb)
        slab = payload[ids.reshape(-1)]
        slab = slab.reshape(T4, GT, slab_u, Un, PAYLOAD_WIDTH, BLOCK_SIZE)
        slab = slab.transpose(0, 2, 4, 1, 3, 5).reshape(
            T4, slab_u, PAYLOAD_WIDTH, L)
        slab_spec = pl.BlockSpec((1, slab_u, PAYLOAD_WIDTH, L),
                                 lambda t: (t, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        slab = jnp.zeros((1, 1, PAYLOAD_WIDTH, BLOCK_SIZE), payload.dtype)
        slab_spec = pl.BlockSpec((1, 1, PAYLOAD_WIDTH, BLOCK_SIZE),
                                 lambda t: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)

    import numpy as _np
    ts = cfg.tile_size
    pix = _np.arange(NPX)
    xs = (pix % ts).astype(_np.float32)
    ys = (pix // ts).astype(_np.float32)
    ones = _np.ones(NPX, _np.float32)
    f = _np.stack([ones, xs, ys, xs * xs, ys * ys, xs * ys, ones,
                   _np.zeros(NPX, _np.float32)], axis=1)
    hi = f.astype(jnp.bfloat16)
    lo = (f - hi.astype(_np.float32)).astype(jnp.bfloat16)
    if ts > 16:
        pixf_cat_np = _np.concatenate([hi, hi, lo], axis=1)
    else:
        pixf_cat_np = _np.concatenate([hi, hi], axis=1)
    # block-diagonal strict lower triangle over per-tile big segments
    ii = _np.arange(GT * obig)
    lt_np = ((ii[:, None] < ii[None, :])
             & (ii[:, None] // obig == ii[None, :] // obig)).astype(
        jnp.bfloat16 if lowp else _np.float32)

    kern = functools.partial(
        _render_kernel_v4, gx=gx, tile_size=ts, num_groups=T4,
        early_exit=early_exit, lowp=lowp, max_batches=max_batches,
        obig=obig, U=Un, gt=GT, slab_u=slab_u, ablate=ablate)

    return pl.pallas_call(
        kern,
        grid=(T4,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, PAYLOAD_WIDTH, GT * obig), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NPX, GT * obig), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            slab_spec,
            pl.BlockSpec((NPX, pixf_cat_np.shape[1]), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GT * obig, GT * obig), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, GT * NPX, OUT_CH), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T4, GT * NPX, OUT_CH), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((2, GT * 8, 128), jnp.int32),
            pltpu.SMEM((5 * GT,), jnp.int32),
            pltpu.SMEM((GT,), jnp.int32),
            pltpu.VMEM((2, PAYLOAD_WIDTH, L), jnp.float32),
            pltpu.VMEM((2, NPX, L), jnp.float32),      # pend_z
            pltpu.VMEM((2, NPX, GT), jnp.float32),     # pend_c
            pltpu.VMEM((2, NPX, L), cdt),              # pend_la
            pltpu.VMEM((2, NPX, L), jnp.bfloat16),     # pend_al
            pltpu.VMEM((2, 4, L), jnp.bfloat16),       # pend_rgb
            pltpu.VMEM((2, 1, L), jnp.int32),          # pend_w
            pltpu.VMEM((NPX, GT * obig), jnp.float32),  # big_z
            pltpu.VMEM((4, GT * obig), jnp.bfloat16),  # big_rgb
            pltpu.VMEM((1, GT * obig), jnp.float32),   # big_d
            pltpu.VMEM((1, GT * obig), jnp.int32),     # big_w
            pltpu.VMEM((NPX, 4 * GT), jnp.float32),    # acc
            pltpu.VMEM((NPX, 2 * GT), jnp.float32),    # tvals
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, GT, Un)),
        ],
        interpret=interpret,
    )(rows4, payload, bigpay4, bigla4, slab, jnp.asarray(pixf_cat_np),
      jnp.asarray(lt_np))


def tile_channels_v4(tiles: jnp.ndarray, cfg: RasterizerConfig):
    """(T4, GT*NPX, C) -> (T, NPX, C) per true tile (index grouping)."""
    gx, gy = cfg.tile_dims
    T = gx * gy
    NPX = cfg.tile_size * cfg.tile_size
    C = tiles.shape[-1] if tiles.ndim == 3 else 1
    return tiles.reshape(-1, NPX, C)[:T]


def assemble_image_v4(tiles: jnp.ndarray, cfg: RasterizerConfig):
    """(T4, GT*NPX, OUT_CH) -> ((4, H, W) PLANAR image, (T, NPX) t_final).

    Channel-planar for the same reason as assemble_image_v3: channels-minor
    (H, W, 4) tiles at 4/128 lane utilization on TPU."""
    gx, gy = cfg.tile_dims
    ts = cfg.tile_size
    w, h = cfg.target_size
    T = gx * gy
    NPX = ts * ts
    per_tile = tile_channels_v4(tiles, cfg)          # (T, NPX, OUT_CH)
    t_final = per_tile[:, :, 4]
    chp = tiles.transpose(2, 0, 1)[:4].reshape(4, -1, NPX)[:, :T]
    img = chp.reshape(4, gy, gx, ts, ts)
    img = img.transpose(0, 1, 3, 2, 4).reshape(4, gy * ts, gx * ts)
    return img[:, :h, :w], t_final
