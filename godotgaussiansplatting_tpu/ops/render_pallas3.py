"""Pallas TPU render kernel v3: batch-exact compositing + per-tile big lanes.

TPU-native counterpart of `gsplat_render.glsl` (third generation; supersedes
ops/render_pallas2.py). Two structural problems of v2 drove this redesign,
both measured on v5e at the 5.8M-splat/1080p headline:

  * v2 issued ~3 small dependent matmuls per 128-lane block; with early exit
    leaving only ~22 processed blocks/tile the kernel ran at ~570 ns per
    block-pair — MXU *latency*-bound, ~6x off the throughput bound.
  * v2's lag-1 exact window could not order big-splat blocks whose depth
    ranges span the whole scene, capping fidelity at ~36 dB vs exact.

v3 composites CHAIN blocks per batch of U=4 (512 lanes):

  power      ONE (NPX, 8) @ (8, U*S) matmul for the whole batch. Per-lane
             Gaussian features (ops/blocks2.py) are re-centered from the
             stored center (payload rows 14/15) to the TILE ORIGIN in-kernel
             (a per-lane-coefficient recombination of the 6 feature rows),
             so all lanes share one pixel-feature matrix — and pixel
             coordinates are tile-local (<16), better f32 conditioning than
             v2's block-relative coordinates. (gsplat_render.glsl:84's
             per-thread quadratic.)
  ordering   ONE (NPX, U*S) @ (U*S, U*S) matmul against a depth-indicator
             matrix M[i,j] = [lane i strictly in front of lane j] makes the
             composite EXACT for arbitrary depth interleaving *within* the
             batch (the in-VMEM analogue of the reference's globally sorted
             traversal, gsplat_render.glsl:79-91). Across batches, lag-1
             batch corrections (two scalar-gated masked matmuls) extend the
             exact window to ±1 batch = ±4 blocks, and are SKIPPED when
             consecutive batches don't overlap in depth — the common case.

and keeps the tile's BIG-SPLAT lanes (ops/bigbin.py: per-tile exact
depth-sorted lists of the radius>=BIG_RADIUS subset) RESIDENT for the whole
tile: their mutual order is exact by construction (one in-VMEM prefix
matmul), and chain<->big occlusion is exchanged per chain block through its
depth midpoint — each (chain block, big lane) pair interacts in exactly one
direction, so energy is conserved; the approximation error is bounded by
the mass of chain blocks whose depth slab straddles a big lane.

All in-window ordering — including equal-depth16 ties — follows (depth16,
source index) lexicographic order, which IS the exact pipeline's semantics
(its stable pair sort breaks ties by emission order; the reference's GPU
sort races instead, SURVEY.md §2.1). Residual deviation vs a full global
sort: chain blocks >= 2 batches apart with overlapping depth ranges, and
per-tile big lists truncated at OBIG (closest-first; counted upstream).
The per-pixel early-out (gsplat_render.glsl:79) is applied at batch
granularity and accounts for resident big mass in front of the stream
position.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RasterizerConfig
from .blocks2 import BLOCK_SIZE, DEPTH_INVALID, GATE_OFF, PAYLOAD_WIDTH

OUT_CH = 8         # output channels per pixel: r, g, b, 1, t_final, diag...
BATCH_LANES = 512  # lanes per chain batch at tile_size 16 (U = BATCH_LANES /
                   # BLOCK_SIZE blocks; default_batch_u scales U down as the
                   # pixel count grows so pend_* stays inside VMEM)
LOG_MIN_ALPHA = -5.54126354515843  # ln(1/255)
ALPHA_MAX = 0.99994


def default_batch_u(tile_size: int) -> int:
    """Blocks per chain batch: 4 at tile 16; scaled down with pixel count
    (pend_z/pend_la are (2, NPX, U*S) — U=4 at NPX=1024 would be ~6 MB)."""
    return max(1, (BATCH_LANES // BLOCK_SIZE) // max(1, (tile_size // 16) ** 2))


def _render_kernel_v3(
    rows_hbm,        # (T, 8, 128) i32 ANY — packed per-tile rows
    payload_hbm,     # (B, PW, S) f32 ANY — per-block chain payload
    bigpay_hbm,      # (T, PW, OBIG) f32 ANY — per-tile big-lane payload
    pixf_b_ref,      # (NPX, 8) bf16 VMEM — static pixel features (hi)
    pixf_lo_ref,     # (NPX, 8) bf16 VMEM — lo half (zeros at tile<=16)
    lt_ob_ref,       # (OBIG, OBIG) cdt VMEM — strict lower-triangle mask
    out_ref,         # (1, NPX, OUT_CH) f32
    row_smem,        # SMEM (2, 8, 128) i32
    meta,            # SMEM (4,) i32 — [prev_bmin, prev_bmax, big_bucket_mask]
    pay_vmem,        # VMEM (2*U, PW, S) f32 — chain batch ring
    big_vmem,        # VMEM (2, PW, OBIG) f32 — big payload ring
    pend_z,          # VMEM (2, NPX, US) f32
    pend_la,         # VMEM (2, NPX, US) cdt
    pend_rgb,        # VMEM (2, 4, US) bf16
    pend_d,          # VMEM (2, 1, US) f32
    pend_i,          # VMEM (2, 1, US) i32 — source idx (lex tie-break)
    big_z,           # VMEM (NPX, OBIG) f32
    big_la,          # VMEM (NPX, OBIG) cdt
    big_rgb,         # VMEM (4, OBIG) bf16
    big_d,           # VMEM (1, OBIG) f32
    big_i,           # VMEM (1, OBIG) i32
    cols_v,          # VMEM (NPX, 8) f32 — one lane-padded buffer holding all
                     # per-pixel column state: [acc r,g,b,-, tcar, texit,
                     # big_tot, -] (separate (NPX,1) scratches each pad to
                     # 128 lanes = 512 KB at tile 32)
    row_sems,        # DMA sems (2,)
    sems,            # DMA sems (2, U)
    big_sems,        # DMA sems (2,)
    *, gx: int, tile_size: int, num_tiles: int, early_exit: bool,
    lowp: bool, max_batches: int, obig: int, U: int, ablate: str = "",
):
    S = BLOCK_SIZE
    US = U * S
    NPX = tile_size * tile_size
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    cdt = bf16 if lowp else f32
    t = pl.program_id(0)
    slot_r = jax.lax.rem(t, 2)

    def srow(pos, base, slot):
        k = pos + base * 128
        return row_smem[slot, k // 128, jax.lax.rem(k, 128)]

    def block_id(pos, slot):
        return srow(pos, 1, slot) & 0x7FFFFF

    def start_batch0(slot):
        """Start batch-0 chain DMAs for the tile whose rows sit in
        row_smem[slot] (into ring group 0 / sems[0, u])."""
        nb_s = row_smem[slot, 0, 0]
        for u in range(U):
            @pl.when(u < nb_s)
            def _(u=u):
                pltpu.make_async_copy(
                    payload_hbm.at[block_id(u, slot)], pay_vmem.at[u],
                    sems.at[0, u]).start()

    # --- tile-row + big-payload double buffering ----------------------------
    # Invariant at the top of tile t>0: row_smem[slot_r] was already WAITED
    # at the END of tile t-1, and this tile's batch-0 chain DMAs are already
    # in flight (started from tile t-1's tail) — batch-0 DMA latency is
    # hidden behind the previous tile's drain + this tile's big pre-pass.
    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(rows_hbm.at[0], row_smem.at[0],
                              row_sems.at[0]).start()
        pltpu.make_async_copy(bigpay_hbm.at[0], big_vmem.at[0],
                              big_sems.at[0]).start()
        pltpu.make_async_copy(rows_hbm.at[0], row_smem.at[0],
                              row_sems.at[0]).wait()
        start_batch0(0)
    pltpu.make_async_copy(bigpay_hbm.at[0], big_vmem.at[slot_r],
                          big_sems.at[slot_r]).wait()
    @pl.when(t + 1 < num_tiles)
    def _():
        pltpu.make_async_copy(rows_hbm.at[t + 1], row_smem.at[1 - slot_r],
                              row_sems.at[1 - slot_r]).start()
        pltpu.make_async_copy(bigpay_hbm.at[t + 1], big_vmem.at[1 - slot_r],
                              big_sems.at[1 - slot_r]).start()

    nb = row_smem[slot_r, 0, 0]
    cand = row_smem[slot_r, 0, 1]
    hm_f = row_smem[slot_r, 0, 2].astype(f32) * (1.0 / 65536.0)
    y_off = row_smem[slot_r, 0, 3]
    nbig = row_smem[slot_r, 0, 4]
    has_big = nbig > 0

    def block_mm(pos):
        w = srow(pos, 3, slot_r)
        return (w >> 16) & 0xFFFF, w & 0xFFFF

    # --- shared pixel features (tile-local; static, pipelined in once) ------
    tile_x = (jax.lax.rem(t, gx) * tile_size).astype(f32)
    tile_y = ((t // gx) * tile_size + y_off).astype(f32)
    tsz = float(tile_size)

    def eval_payload(pay, live):
        """(PW, W) payload -> (F (8,W) tile-centered, rgbT (3,W), d (1,W),
        i (1,W) source index).

        live: scalar or (1, W) mask; dead lanes get alpha=0 via GATE_OFF."""
        f0, f1, f2 = pay[0:1, :], pay[1:2, :], pay[2:3, :]
        f3, f4, f5 = pay[3:4, :], pay[4:5, :], pay[5:6, :]
        dx = tile_x - pay[14:15, :]
        dy = tile_y - pay[15:16, :]
        f0u = f0 + dx * f1 + dy * f2 + dx * dx * f3 + dy * dy * f4 \
            + dx * dy * f5
        f1u = f1 + 2.0 * dx * f3 + dy * f5
        f2u = f2 + 2.0 * dy * f4 + dx * f5
        ixr, iyr = pay[9:10, :], pay[10:11, :]
        # row 11: anisotropic half-widths rx|ry as a bf16 bit-pair
        # (ops/blocks2.extents_from_conic)
        rw = jax.lax.bitcast_convert_type(pay[11:12, :], jnp.uint32)
        rxw = jax.lax.bitcast_convert_type(
            (rw & 0xFFFF).astype(jnp.uint16), bf16).astype(f32)
        ryw = jax.lax.bitcast_convert_type(
            (rw >> 16).astype(jnp.uint16), bf16).astype(f32)
        covered = ((ixr - rxw < tile_x + tsz) & (ixr + rxw > tile_x)
                   & (iyr - ryw < tile_y + tsz) & (iyr + ryw > tile_y))
        gate = jnp.where(covered & live, 0.0, GATE_OFF)
        z1 = jnp.zeros((1, pay.shape[1]), f32)
        F = jnp.concatenate([
            jnp.where(live, f0u, GATE_OFF),
            jnp.where(live, f1u, 0.0), jnp.where(live, f2u, 0.0),
            jnp.where(live, f3, 0.0), jnp.where(live, f4, 0.0),
            jnp.where(live, f5, 0.0), gate, z1], axis=0)        # (8, W)
        rgbT = jnp.where(live, pay[6:9, :], 0.0).astype(bf16)   # (3, W)
        d_row = jnp.where(live, pay[12:13, :], DEPTH_INVALID)   # (1, W)
        i_row = jax.lax.bitcast_convert_type(pay[13:14, :], jnp.int32)
        return F, rgbT, d_row, i_row

    def lex_front(dA, iA, dB, iB):
        """in-front indicator by (depth, source idx) lexicographic order —
        the EXACT pipeline's tie semantics: its stable pair sort breaks
        equal (tile, depth16) keys by emission order = splat index
        (ops/sort.py; the reference's GPU sort races instead). Arithmetic
        masks: lt/eq are disjoint, so lt + eq*ilt is their union."""
        return ((dA < dB).astype(cdt)
                + (dA == dB).astype(cdt) * (iA < iB).astype(cdt))

    # At tile_size <= 16, pixf entries are small integers (<= 15^2 = 225):
    # EXACTLY bf16-representable, so splitting only F into hi+lo bf16 halves
    # gives ~2^-16-relative power accuracy in TWO MXU passes (vs HIGHEST's
    # six; Mosaic does not lower Precision.HIGH). At tile_size 32 entries
    # reach 961 (> 256, inexact in bf16): pixf gets its own lo half and a
    # third pass keeps the same accuracy.
    pixf_b = pixf_b_ref[...]
    pixf_lo = pixf_lo_ref[...] if tile_size > 16 else None

    def mm_power(F_all):
        Fh = F_all.astype(bf16)
        Fl = (F_all - Fh.astype(f32)).astype(bf16)
        P = jax.lax.dot_general(
            pixf_b, Fh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        P = P + jax.lax.dot_general(
            pixf_b, Fl, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        if pixf_lo is not None:
            P = P + jax.lax.dot_general(
                pixf_lo, Fh, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
        alpha = jnp.minimum(jnp.exp(P), ALPHA_MAX)
        la = jnp.log1p(-alpha)
        return alpha, la

    # --- init per-tile state ------------------------------------------------
    cols_v[...] = jnp.zeros((NPX, 8), f32)

    # --- resident big lanes (exact per-tile depth order) --------------------
    LT_OB = lt_ob_ref[...]

    @pl.when(has_big)
    def _():
        F, rgbT, d_row, i_row = eval_payload(big_vmem[slot_r], True)
        alpha, la = mm_power(F)
        lac = la.astype(cdt)
        big_la[...] = lac
        # intra-big order = list order: the per-tile big list is depth16-
        # sorted with stable (= source idx) ties, i.e. already (d, idx) lex
        big_z[...] = jax.lax.dot_general(
            lac, LT_OB, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        big_rgb[...] = jnp.concatenate(
            [rgbT, jnp.zeros((1, obig), bf16)], axis=0)
        big_d[...] = d_row
        big_i[...] = i_row
        cols_v[:, 6:7] = jnp.sum(la, axis=1, keepdims=True)
        # 16-bucket depth-occupancy bitmask: the per-batch straddle gate
        # tests it with pure scalar ops — a jnp.any() per batch syncs the
        # scalar core with the VPU every iteration
        bucket = jnp.where(d_row < 0.5 * DEPTH_INVALID,
                           (d_row * (1.0 / 4096.0)).astype(jnp.int32),
                           -1)                                  # (1, OBIG)
        biot = jax.lax.broadcasted_iota(jnp.int32, (16, obig), 0)
        hit_b = jnp.max(jnp.where(biot == bucket, 1, 0), axis=1,
                        keepdims=True)                          # (16, 1)
        pw2 = jnp.left_shift(
            jnp.ones((16, 1), jnp.int32),
            jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0))
        meta[2] = jnp.sum(hit_b * pw2)

    # --- chain batch ring (batch 0 was pre-started from the previous tile) --
    def start_batch(k):
        for u in range(U):
            pos = k * U + u
            @pl.when(pos < nb)
            def _(u=u, pos=pos):
                slot = jax.lax.rem(k, 2) * U + u
                pltpu.make_async_copy(
                    payload_hbm.at[block_id(pos, slot_r)], pay_vmem.at[slot],
                    sems.at[jax.lax.rem(k, 2), u]).start()

    def wait_batch(k):
        for u in range(U):
            pos = k * U + u
            @pl.when(pos < nb)
            def _(u=u, pos=pos):
                pltpu.make_async_copy(
                    payload_hbm.at[0],
                    pay_vmem.at[jax.lax.rem(k, 2) * U + u],
                    sems.at[jax.lax.rem(k, 2), u]).wait()

    def emit(la_b, z, rgbT4):
        """acc += (alpha * exp(z)) @ rgb, with alpha = 1 - exp(la).

        Factored as exp(z) - exp(z + la): two exps, no expm1 (which Mosaic
        does not lower), and no alpha buffer."""
        laf = la_b.astype(f32)
        w = (jnp.exp(z) - jnp.exp(z + laf)).astype(bf16)
        cols_v[:, 0:4] += jax.lax.dot_general(
            w, rgbT4, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    def body(k):
        wait_batch(k)
        start_batch(k + 1)
        g = jax.lax.rem(k, 2)
        sc, sp = g, 1 - g

        bmin = jnp.int32(0x10000)
        bmax = jnp.int32(-1)
        for u in range(U):
            pos = k * U + u
            live = pos < nb
            mn, mx = block_mm(pos)
            bmin = jnp.where(live, jnp.minimum(bmin, mn), bmin)
            bmax = jnp.where(live, jnp.maximum(bmax, mx), bmax)

        # one concatenated (PW, US) payload: the feature shift then runs as
        # (1, US)-wide row ops instead of 4x (1, S) — Mosaic's per-op
        # overhead on tiny vectors dominated the eval cost otherwise
        pay_all = jnp.concatenate(
            [pay_vmem[g * U + u] for u in range(U)], axis=1)    # (PW, US)
        lane_blk = jax.lax.broadcasted_iota(jnp.int32, (1, US), 1) // S
        live_v = (k * U + lane_blk) < nb                        # (1, US)
        F_all, rgbT, d_cur, i_cur = eval_payload(pay_all, live_v)
        if "eval" in ablate:
            la = jnp.full((NPX, US), -0.01, f32)
        else:
            _, la = mm_power(F_all)                             # (NPX, US)
        lac = la.astype(cdt)
        tot = jnp.sum(la, axis=1, keepdims=True)                # (NPX, 1)

        # intra-batch exact order matrix: lane i in front of lane j by
        # (depth, source idx) lex — blocks2 does not depth-sort block
        # interiors; this matrix IS the sort, with exact-mode tie semantics
        d_col = d_cur.reshape(US, 1)
        i_col = i_cur.reshape(US, 1)
        if "cums" in ablate:
            cums = jnp.zeros((NPX, US), f32)
        else:
            M = lex_front(d_col, i_col, d_cur, i_cur)
            cums = jax.lax.dot_general(
                lac, M, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)                     # (NPX, US)

        if "pend" not in ablate:
            pend_la[sc] = lac
            pend_rgb[sc] = jnp.concatenate(
                [rgbT, jnp.zeros((1, US), bf16)], axis=0)
            pend_d[sc] = d_cur
            pend_i[sc] = i_cur
            pend_z[sc] = cums + cols_v[:, 4:5]

        # chain <-> big exchange. Exact in both directions: when a big lane
        # STRADDLES this batch's depth range, pay two masked matmuls; in the
        # common disjoint case, exact per-pixel mass adds suffice (a big
        # entirely before bmin is in front of every batch lane; a batch is
        # entirely in front of any big past bmax).
        bminf = bmin.astype(f32)
        bmaxf = bmax.astype(f32)
        d_big = big_d[...]
        # scalar straddle gate via the per-tile bucket mask (conservative:
        # bucket granularity can fire the exact matmul path spuriously,
        # never the reverse)
        b0 = jnp.clip(bmin >> 12, 0, 15)
        b1 = jnp.clip(bmax >> 12, 0, 15)
        rmask = jnp.left_shift(
            jnp.left_shift(jnp.int32(1), b1 - b0 + 1) - 1, b0)
        strad = has_big & (bmax >= bmin) & ((meta[2] & rmask) != 0)
        if "bigx" in ablate:
            strad = strad & (nb < 0)
            has_big_x = has_big & (nb < 0)
        else:
            has_big_x = has_big
        @pl.when(strad)
        def _():
            i_big = big_i[...]
            mask_bc = lex_front(d_big.reshape(obig, 1),
                                i_big.reshape(obig, 1), d_cur, i_cur)
            pend_z[sc] += jax.lax.dot_general(
                big_la[...], mask_bc, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)                     # (NPX, US)
            mask_cb = lex_front(d_col, i_col, d_big, i_big)     # (US, OBIG)
            big_z[...] += jax.lax.dot_general(
                lac, mask_cb, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
        @pl.when(has_big_x & ~strad)
        def _():
            bfm = jnp.sum(big_la[...].astype(f32) * (d_big < bminf),
                          axis=1, keepdims=True)                # (NPX, 1)
            pend_z[sc] += bfm
            big_z[...] += tot * (d_big > bmaxf).astype(f32)

        # cross-batch lag-1 corrections (gated on depth-range overlap)
        p_live = k > 0
        ovl_p = p_live & (bmin <= meta[1]) & (bmax >= meta[0])
        if "corr" in ablate:
            ovl_p = p_live & (nb < 0)
        @pl.when(ovl_p)
        def _():
            d_p = pend_d[sp]
            i_p = pend_i[sp]
            mf = lex_front(d_col, i_col, d_p, i_p)              # (USc, USp)
            pend_z[sp] += jax.lax.dot_general(
                lac, mf, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            # prev mass NOT in front of each current lane (1 - lex)
            mb = 1.0 - lex_front(d_p.reshape(US, 1),
                                 i_p.reshape(US, 1), d_cur, i_cur)
            pend_z[sc] -= jax.lax.dot_general(
                pend_la[sp], mb, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)

        if "emit" not in ablate:
            @pl.when(p_live)
            def _():
                emit(pend_la[sp], pend_z[sp], pend_rgb[sp])
        tcar = cols_v[:, 4:5] + tot
        cols_v[:, 4:5] = tcar
        # exit metric: chain mass + big mass certainly in front of every
        # future block (future min_depth >= current bmin)
        bexit = jnp.where(
            has_big,
            jnp.sum(big_la[...].astype(f32) * (d_big < bminf),
                    axis=1, keepdims=True),
            jnp.zeros((NPX, 1), f32))
        cols_v[:, 5:6] = tcar + bexit
        meta[0] = bmin
        meta[1] = bmax
        return k + 1

    def cond(k):
        go = (k * U < nb) & (k < max_batches)
        if early_exit:
            go = go & (jnp.max(cols_v[:, 5:6]) > LOG_MIN_ALPHA)
        return go

    k_end = jax.lax.while_loop(cond, body, jnp.int32(0))
    wait_batch(k_end)   # drain the in-flight batch

    # prefetch the NEXT tile's batch 0 now: its rows arrived during this
    # tile (started at the top), and the emits/present below hide the DMA
    @pl.when(t + 1 < num_tiles)
    def _():
        pltpu.make_async_copy(rows_hbm.at[0], row_smem.at[1 - slot_r],
                              row_sems.at[1 - slot_r]).wait()
        start_batch0(1 - slot_r)

    @pl.when(k_end > 0)
    def _():
        sp = jax.lax.rem(k_end - 1, 2)
        emit(pend_la[sp], pend_z[sp], pend_rgb[sp])

    @pl.when(has_big)
    def _():
        emit(big_la[...], big_z[...], big_rgb[...])

    t_exp = cols_v[:, 4:5] + jnp.where(has_big, cols_v[:, 6:7],
                                       jnp.zeros((NPX, 1), f32))
    t_final = jnp.exp(t_exp)                                    # (NPX, 1)

    # --- present: heatmap mix + channel assembly ----------------------------
    mixf = cand.astype(f32) * 5e-4
    cov = (1.0 - t_final) * hm_f
    ch = jax.lax.broadcasted_iota(jnp.int32, (NPX, OUT_CH), 1)
    hm = jnp.where(ch == 0, 1.0 * mixf,
                   jnp.where(ch == 1, 0.2 * mixf,
                             jnp.where(ch == 2, 1.0 - 0.8 * mixf, 0.0))) * cov

    acc = cols_v[:, 0:3]
    rgb_full = jnp.concatenate(
        [acc, jnp.zeros((NPX, OUT_CH - 3), f32)], axis=1)
    out = rgb_full + hm
    out = jnp.where(ch == 3, 1.0, out)
    out = jnp.where(ch == 4, t_final, out)
    # diagnostics: ch5 = chain blocks processed, ch6 = nb, ch7 = nbig
    out = jnp.where(ch == 5, jnp.minimum(k_end * U, nb).astype(f32), out)
    out = jnp.where(ch == 6, nb.astype(f32), out)
    out = jnp.where(ch == 7, nbig.astype(f32), out)
    out_ref[0] = out


def pack_tile_rows_v3(tile_blocks, tile_nblocks, tile_nbig, tile_minmax,
                      tile_candidates, heatmap_factor,
                      pixel_offset_y=0):
    """Tile lists -> (T, 8, 128) i32 rows: row0 = [nb, cand, hm16.16, y_off,
    nbig], rows 1-2 = block ids, rows 3-4 = minmax, rows 5-7 spare
    (feature centers ride payload rows 14/15)."""
    T, C2 = tile_blocks.shape
    assert C2 <= 256
    hm_bits = jnp.round(
        jnp.asarray(heatmap_factor, jnp.float32) * 65536.0).astype(jnp.int32)
    yoff = jnp.broadcast_to(
        jnp.asarray(pixel_offset_y, jnp.int32).reshape(1, 1), (T, 1))
    hdr = jnp.concatenate([
        tile_nblocks.reshape(T, 1).astype(jnp.int32),
        tile_candidates.reshape(T, 1).astype(jnp.int32),
        jnp.broadcast_to(hm_bits.reshape(1, 1), (T, 1)),
        yoff,
        tile_nbig.reshape(T, 1).astype(jnp.int32),
        jnp.zeros((T, 128 - 5), jnp.int32),
    ], axis=1)

    def sect(a):
        return jnp.concatenate(
            [a.astype(jnp.int32), jnp.zeros((T, 256 - C2), jnp.int32)],
            axis=1)

    rows = jnp.concatenate(
        [hdr, sect(tile_blocks), sect(tile_minmax),
         jnp.zeros((T, 3 * 128), jnp.int32)], axis=1)
    return rows.reshape(T, 8, 128)


def render_tiles_v3(
    payload: jnp.ndarray,          # (B, PW, S) f32
    bins,                          # TileBins2
    tile_bigs,                     # TileBigs (ops/bigbin.py)
    heatmap_factor: jnp.ndarray,   # () f32
    cfg: RasterizerConfig,
    early_exit: bool = True,
    lowp: bool = True,
    interpret: bool = False,
    pixel_offset_y=0,
    batch_u: int | None = None,
    ablate: str | None = None,
):
    """Launch the v3 kernel over the tile grid -> (T, NPX, OUT_CH) tiles.

    batch_u / ablate are explicit static knobs (benchmark ablation hooks);
    when left None they fall back to the GS_BATCH_U / GS_KERNEL_ABLATE env
    vars for command-line sweeps — with a loud warning for ablate, since a
    stray env var would silently corrupt production renders (and changing
    either after first compile is ignored by the jit cache)."""
    gx, gy = cfg.tile_dims
    T = gx * gy
    NPX = cfg.tile_size * cfg.tile_size
    if jax.default_backend() == "cpu":
        interpret = True   # Mosaic kernels only compile for TPU

    C2 = bins.tile_blocks.shape[1]
    obig = tile_bigs.bigpay.shape[2]
    import os as _os
    if batch_u is None:
        batch_u = int(_os.environ.get("GS_BATCH_U",
                                      default_batch_u(cfg.tile_size)))
    Un = batch_u
    max_batches = -(-C2 // Un)
    cdt = jnp.bfloat16 if lowp else jnp.float32
    if ablate is None:
        ablate = _os.environ.get("GS_KERNEL_ABLATE", "")
        if ablate:
            import warnings
            warnings.warn(
                f"GS_KERNEL_ABLATE={ablate!r} is set: render kernel stages "
                "are STRIPPED; output is corrupt by design (ablation runs "
                "only).", RuntimeWarning, stacklevel=2)
    rows = pack_tile_rows_v3(bins.tile_blocks, bins.tile_nblocks,
                             tile_bigs.tile_nbig, bins.tile_minmax,
                             bins.tile_candidates,
                             heatmap_factor, pixel_offset_y)
    US = Un * BLOCK_SIZE
    kern = functools.partial(
        _render_kernel_v3, gx=gx, tile_size=cfg.tile_size, num_tiles=T,
        early_exit=early_exit, lowp=lowp, max_batches=max_batches,
        obig=obig, U=Un, ablate=ablate)

    # static per-tile constants, pipelined in ONCE (constant block index):
    # the pixel-feature matrix (tile-local coordinates, identical for every
    # tile) and the strict big-lane order triangle
    ts = cfg.tile_size
    import numpy as _np
    pix = _np.arange(NPX)
    pxl = (pix % ts).astype(_np.float32)
    pyl = (pix // ts).astype(_np.float32)
    ones = _np.ones(NPX, _np.float32)
    pixf_np = _np.stack([ones, pxl, pyl, pxl * pxl, pyl * pyl, pxl * pyl,
                         ones, _np.zeros(NPX, _np.float32)], axis=1)
    pixf_b_np = pixf_np.astype(jnp.bfloat16)
    pixf_lo_np = (pixf_np - pixf_b_np.astype(_np.float32)).astype(
        jnp.bfloat16)
    lt_ob_np = (_np.arange(obig)[:, None] < _np.arange(obig)[None, :]).astype(
        jnp.bfloat16 if lowp else _np.float32)

    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((NPX, 8), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NPX, 8), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((obig, obig), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NPX, OUT_CH), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, NPX, OUT_CH), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((2, 8, 128), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.VMEM((2 * Un, PAYLOAD_WIDTH, BLOCK_SIZE), jnp.float32),
            pltpu.VMEM((2, PAYLOAD_WIDTH, obig), jnp.float32),
            pltpu.VMEM((2, NPX, US), jnp.float32),     # pend_z
            pltpu.VMEM((2, NPX, US), cdt),             # pend_la
            pltpu.VMEM((2, 4, US), jnp.bfloat16),      # pend_rgb
            pltpu.VMEM((2, 1, US), jnp.float32),       # pend_d
            pltpu.VMEM((2, 1, US), jnp.int32),         # pend_i
            pltpu.VMEM((NPX, obig), jnp.float32),      # big_z
            pltpu.VMEM((NPX, obig), cdt),              # big_la
            pltpu.VMEM((4, obig), jnp.bfloat16),       # big_rgb
            pltpu.VMEM((1, obig), jnp.float32),        # big_d
            pltpu.VMEM((1, obig), jnp.int32),          # big_i
            pltpu.VMEM((NPX, 8), jnp.float32),         # cols
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, Un)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rows, payload, tile_bigs.bigpay, jnp.asarray(pixf_b_np),
      jnp.asarray(pixf_lo_np), jnp.asarray(lt_ob_np))


def assemble_image_v3(tiles: jnp.ndarray, cfg: RasterizerConfig):
    """(T, NPX, OUT_CH) tile buffer -> ((H, W, 4) image, (T, NPX) t_final)."""
    gx, gy = cfg.tile_dims
    ts = cfg.tile_size
    w, h = cfg.target_size
    t_final = tiles[:, :, 4]
    img = tiles[:, :, :4].reshape(gy, gx, ts, ts, 4)
    img = img.transpose(0, 2, 1, 3, 4).reshape(gy * ts, gx * ts, 4)
    return img[:h, :w], t_final
