"""Pallas TPU render kernel v2: MXU-factorized per-tile compositing.

TPU-native counterpart of `gsplat_render.glsl`, second generation. The
round-1 kernel (ops/render_pallas.py) evaluated the Gaussian and the
transmittance chain with ~30 f32 VPU ops per (pixel, splat); on v5e the VPU
is the scarce resource (~0.6 T f32 op/s measured) while the MXU idles. v2
restructures the math so the MXU carries it:

  power evaluation    gsplat_render.glsl:84's per-thread quadratic becomes
                      ONE (NPX, 8) @ (8, S) matmul per block: the power is
                      bilinear in pixel features [1, px', py', px'^2, py'^2,
                      px'py'] and per-splat features f0..f5 precomputed at
                      block build (ops/blocks2.py). The rect-coverage gate
                      and the per-block running log-transmittance ride as
                      extra feature rows/columns for free.
  transmittance chain gsplat_render.glsl:90's sequential t *= (1-alpha)
                      becomes a log-space prefix: cums = log1p(-alpha) @ LT
                      with LT the constant strict-lower-triangular matrix
                      (chain="mm_*"), or a Hillis-Steele lane product
                      (chain="roll_*"). bf16 variants halve VPU cost at
                      ~0.4% relative-transmittance rounding.
  blend weights       w = alpha * exp(cums + lt); color accumulates via a
                      second matmul (NPX, S) @ (S, 3).

Ordering semantics: blocks composite in list order (front-to-back by block
min depth16); each block's lanes are exactly depth-sorted (blocks2 stage-2
sort). With xmask=True the kernel repairs adjacent-block depth interleaving
exactly via lag-1 emission: block v's colors are emitted one step late,
once block v+1's alphas are known, with two data-dependent (S, S) depth
masks adjusting the log-transmittance — one removes block v-1's
deeper-than-lane mass (over-counted by list order), one adds block v+1's
shallower-than-lane mass (not yet counted). This makes the composite exact
under a ±1-list-position interleaving window; residual deviation vs a full
global sort: interleavings that skip a list position, and equal-depth16
ties (mutually non-occluding here; GPU-race nondeterministic in the
reference, SURVEY.md §2.1).

Deviation from the reference, documented: the per-PIXEL early-out
(gsplat_render.glsl:79 `t > MIN_ALPHA`) is applied at block granularity
only (max-over-pixels, = the reference's cooperative workgroup exit at
:45-48); a pixel past the cutoff can keep accumulating until its tile's
blocks exhaust, bounded by t <= 1/255 total extra mass. quality="exact"
(ops/render.py) retains the per-pixel cutoff bit-faithfully.

Per-batch software pipelining: U=4 blocks are processed per loop step with
a deterministic two-group DMA ring (batch k+1's payloads stream while batch
k computes), replacing round-1's per-block ring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MIN_FACTOR, RasterizerConfig
from .blocks2 import BLOCK_SIZE, DEPTH_INVALID, GATE_OFF, PAYLOAD_WIDTH

OUT_CH = 8         # output channels per pixel: r, g, b, 1, t_final, pad...
U = 4              # blocks per pipelined batch
ROW_HDR = 8
LOG_MIN_ALPHA = -5.54126354515843  # ln(1/255)
MAXIT = 1024       # hard batch-count backstop


def _lane_cumprod_exclusive(x):
    """Exclusive prefix product along the lane axis (length BLOCK_SIZE)."""
    s = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    one = jnp.ones((), x.dtype)
    y = jnp.where(lane >= 1, pltpu.roll(x, 1, axis=len(x.shape) - 1), one)
    k = 1
    while k < s:
        y = y * jnp.where(lane >= k,
                          pltpu.roll(y, k, axis=len(x.shape) - 1), one)
        k *= 2
    return y


def _render_kernel_v2(
    rows_hbm,        # (T, 8, 128) i32 ANY — packed per-tile rows
    payload_hbm,     # (B, PW, S) f32 ANY — per-block splat payload
    out_ref,         # (1, NPX, OUT_CH) f32
    row_smem,        # SMEM (2, 8, 128) i32
    pay_vmem,        # VMEM (2*U, PW, S) f32
    row_sems,        # DMA sems (2,)
    sems,            # DMA sems (2, U)
    *, gx: int, tile_size: int, num_tiles: int, early_exit: bool,
    chain: str, xmask: bool,
):
    S = BLOCK_SIZE
    NPX = tile_size * tile_size
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    t = pl.program_id(0)
    slot_r = jax.lax.rem(t, 2)

    # --- tile-row double buffering (as round-1) -----------------------------
    @pl.when(t == 0)
    def _():
        pltpu.make_async_copy(rows_hbm.at[0], row_smem.at[0],
                              row_sems.at[0]).start()
    pltpu.make_async_copy(rows_hbm.at[0], row_smem.at[slot_r],
                          row_sems.at[slot_r]).wait()
    @pl.when(t + 1 < num_tiles)
    def _():
        pltpu.make_async_copy(rows_hbm.at[t + 1], row_smem.at[1 - slot_r],
                              row_sems.at[1 - slot_r]).start()

    nb = row_smem[slot_r, 0, 0]
    cand = row_smem[slot_r, 0, 1]
    hm_f = row_smem[slot_r, 0, 2].astype(f32) * (1.0 / 65536.0)
    y_off = row_smem[slot_r, 0, 3]

    def block_id(pos):
        k = pos + 128  # ids live in rows 1..2
        return row_smem[slot_r, k // 128, jax.lax.rem(k, 128)]

    def block_bc(pos):
        k = pos + 5 * 128  # bc in rows 5..6
        return row_smem[slot_r, k // 128, jax.lax.rem(k, 128)]

    # --- pixel coordinates ---------------------------------------------------
    pix = jax.lax.broadcasted_iota(jnp.int32, (NPX, 1), 0)
    tile_x = (jax.lax.rem(t, gx) * tile_size).astype(f32)
    tile_y = ((t // gx) * tile_size + y_off).astype(f32)
    px = tile_x + jax.lax.rem(pix, tile_size).astype(f32)
    py = tile_y + (pix // tile_size).astype(f32)
    ones_px = jnp.ones((NPX, 1), f32)
    zeros_px = jnp.zeros((NPX, 1), f32)
    tsz = float(tile_size)

    mm = chain.startswith("mm")
    lowp = chain.endswith("bf16")
    cdt = bf16 if lowp else f32
    if mm:
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        LT = (lane_i < lane_j).astype(cdt)          # strict lower (exclusive)
        ones_s = jnp.ones((S, 1), cdt)

    def start_batch(k):
        for u in range(U):
            pos = k * U + u
            @pl.when(pos < nb)
            def _(u=u, pos=pos):
                slot = jax.lax.rem(k, 2) * U + u
                pltpu.make_async_copy(
                    payload_hbm.at[block_id(pos)], pay_vmem.at[slot],
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

    start_batch(jnp.int32(0))

    def eval_block(pos, pay):
        """Order-independent per-block quantities."""
        live = pos < nb
        bcp = block_bc(pos)
        bcx = (bcp & 0x3FFF).astype(f32)
        bcy = ((bcp >> 14) & 0x3FFF).astype(f32)

        ixr = pay[9:10, :]
        iyr = pay[10:11, :]
        rad = pay[11:12, :]
        covered = ((ixr - rad < tile_x + tsz) & (ixr + rad > tile_x)
                   & (iyr - rad < tile_y + tsz) & (iyr + rad > tile_y))
        gate = jnp.where(covered & live, 0.0, GATE_OFF)          # (1, S)

        F = jnp.concatenate([pay[0:6, :], gate, jnp.zeros((1, S), f32)],
                            axis=0)                              # (8, S)
        pxr = px - bcx
        pyr = py - bcy
        pixf = jnp.concatenate(
            [ones_px, pxr, pyr, pxr * pxr, pyr * pyr, pxr * pyr,
             ones_px, zeros_px], axis=1)                         # (NPX, 8)
        P = jax.lax.dot_general(
            pixf, F, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)                 # (NPX, S)
        # The `live` selects guard against NaN/inf garbage in never-DMA'd
        # VMEM slots (positions past nb in the final batch).
        alpha = jnp.where(live, jnp.minimum(jnp.exp(P), 0.99994), 0.0)
        rgbT = jnp.where(live, pay[6:9, :], 0.0).astype(bf16)    # (3, S)
        return alpha, rgbT, pay[12:13, :]

    def blend_block(pos, pay, tcar, acc, pend):
        """Composite one block. tcar: (NPX,1) lt (mm) or t (roll).
        pend: lag-1 emission state for xmask, else None."""
        alpha, rgbT, d_cur = eval_block(pos, pay)

        if mm:
            la = jnp.log1p(-alpha)
            lab = la.astype(cdt)
            cums = jax.lax.dot_general(
                lab, LT, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)                      # (NPX, S)
            tot = jax.lax.dot_general(
                lab, ones_s, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)                      # (NPX, 1)
            if xmask:
                # Emit the PREVIOUS block, now that this block's la is known:
                # add the mass of this block's lanes that sit in front of it.
                ab_p, z_p, rgb_p, lab_p, d_p = pend
                mlt = (jnp.broadcast_to(d_cur.reshape(S, 1), (S, S))
                       < d_p).astype(cdt)                        # (S_cur,S_p)
                corr_next = jax.lax.dot_general(
                    lab, mlt, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                w_p = (ab_p * jnp.exp(z_p + corr_next).astype(bf16))
                acc = acc + jax.lax.dot_general(
                    w_p, rgb_p, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                # This block's pending exponent: list-order prefix minus the
                # previous block's not-yet-reached (deeper) mass.
                mge = (jnp.broadcast_to(d_p.reshape(S, 1), (S, S))
                       >= d_cur).astype(cdt)                     # (S_p,S_cur)
                corr_prev = jax.lax.dot_general(
                    lab_p, mge, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                z = cums + tcar - corr_prev
                pend = (alpha.astype(bf16), z, rgbT, lab, d_cur)
            else:
                w = (alpha * jnp.exp(cums + tcar)).astype(bf16)
                acc = acc + jax.lax.dot_general(
                    w, rgbT, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)                  # (NPX, 3)
            tcar = tcar + tot
        else:
            one_m = (1.0 - alpha).astype(cdt)
            p_excl = _lane_cumprod_exclusive(one_m).astype(f32)
            w = ((alpha * p_excl) * tcar).astype(bf16)
            acc = acc + jax.lax.dot_general(
                w, rgbT, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            p_incl_last = (p_excl[:, S - 1:S]
                           * one_m.astype(f32)[:, S - 1:S])
            tcar = tcar * p_incl_last
        return tcar, acc, pend

    if mm:
        tcar0 = jnp.zeros((NPX, 1), f32)      # lt = log t
    else:
        tcar0 = jnp.ones((NPX, 1), f32)       # t
    if xmask and mm:
        pend0 = (jnp.zeros((NPX, S), bf16),              # alpha
                 jnp.full((NPX, S), GATE_OFF, f32),      # exponent
                 jnp.zeros((3, S), bf16),                # rgb
                 jnp.zeros((NPX, S), cdt),               # la
                 jnp.full((1, S), DEPTH_INVALID, f32))   # depth
    else:
        pend0 = None

    def body(carry):
        k, tcar, acc, pend = carry
        wait_batch(k)
        start_batch(k + 1)
        g = jax.lax.rem(k, 2)
        for u in range(U):
            pay = pay_vmem[g * U + u]
            tcar, acc, pend = blend_block(k * U + u, pay, tcar, acc, pend)
        return k + 1, tcar, acc, pend

    def cond(carry):
        k, tcar, acc, pend = carry
        go = (k * U < nb) & (k < MAXIT)
        if early_exit:
            if mm:
                go = go & (jnp.max(tcar) > LOG_MIN_ALPHA)
            else:
                go = go & (jnp.max(tcar) > 1.0 / MIN_FACTOR)
        return go

    acc0 = jnp.zeros((NPX, 3), f32)
    k_end, tcar, acc, pend = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tcar0, acc0, pend0))

    # Drain the in-flight batch an early exit leaves behind (batch k_end was
    # started by iteration k_end-1 / the pre-loop start; never waited).
    wait_batch(k_end)

    if xmask and mm:
        # Flush the lag-1 pending block (no next block to correct against).
        ab_p, z_p, rgb_p, _, _ = pend
        w_p = ab_p * jnp.exp(z_p).astype(bf16)
        acc = acc + jax.lax.dot_general(
            w_p, rgb_p, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    t_final = jnp.exp(tcar) if mm else tcar

    mixf = cand.astype(f32) * 5e-4
    cov = (1.0 - t_final) * hm_f
    ch = jax.lax.broadcasted_iota(jnp.int32, (NPX, OUT_CH), 1)
    hm = jnp.where(ch == 0, 1.0 * mixf,
                   jnp.where(ch == 1, 0.2 * mixf,
                             jnp.where(ch == 2, 1.0 - 0.8 * mixf, 0.0))) * cov

    rgb_full = jnp.concatenate(
        [acc, jnp.zeros((NPX, OUT_CH - 3), f32)], axis=1)
    out = rgb_full + hm
    out = jnp.where(ch == 3, 1.0, out)
    out = jnp.where(ch == 4, t_final, out)
    out_ref[0] = out


def pack_tile_rows_v2(tile_blocks, tile_nblocks, tile_minmax, tile_bc,
                      tile_candidates, heatmap_factor, pixel_offset_y=0):
    """Tile lists -> (T, 8, 128) i32 rows: row0 = [nb, cand, hm16.16, y_off],
    rows 1-2 = block ids, rows 3-4 = minmax, rows 5-6 = bc, row 7 spare."""
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
        jnp.zeros((T, 128 - 4), jnp.int32),
    ], axis=1)

    def sect(a):
        return jnp.concatenate(
            [a.astype(jnp.int32), jnp.zeros((T, 256 - C2), jnp.int32)],
            axis=1)

    rows = jnp.concatenate(
        [hdr, sect(tile_blocks), sect(tile_minmax), sect(tile_bc),
         jnp.zeros((T, 128), jnp.int32)], axis=1)
    return rows.reshape(T, 8, 128)


def render_tiles_v2(
    payload: jnp.ndarray,          # (B, PW, S) f32
    bins,                          # TileBins2
    heatmap_factor: jnp.ndarray,   # () f32
    cfg: RasterizerConfig,
    early_exit: bool = True,
    chain: str = "mm_bf16",
    xmask: bool = True,
    interpret: bool = False,
    pixel_offset_y=0,
):
    """Launch the v2 kernel over the tile grid -> (T, NPX, OUT_CH) tiles."""
    gx, gy = cfg.tile_dims
    T = gx * gy
    NPX = cfg.tile_size * cfg.tile_size
    if jax.default_backend() == "cpu":
        interpret = True   # Mosaic kernels only compile for TPU

    rows = pack_tile_rows_v2(bins.tile_blocks, bins.tile_nblocks,
                             bins.tile_minmax, bins.tile_bc,
                             bins.tile_candidates, heatmap_factor,
                             pixel_offset_y)
    kern = functools.partial(
        _render_kernel_v2, gx=gx, tile_size=cfg.tile_size, num_tiles=T,
        early_exit=early_exit, chain=chain, xmask=xmask)

    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, NPX, OUT_CH), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, NPX, OUT_CH), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((2, 8, 128), jnp.int32),
            pltpu.VMEM((2 * U, PAYLOAD_WIDTH, BLOCK_SIZE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, U)),
        ],
        interpret=interpret,
    )(rows, payload)


def assemble_image_v2(tiles: jnp.ndarray, cfg: RasterizerConfig):
    """(T, NPX, OUT_CH) tile buffer -> ((H, W, 4) image, (T, NPX) t_final)."""
    gx, gy = cfg.tile_dims
    ts = cfg.tile_size
    w, h = cfg.target_size
    t_final = tiles[:, :, 4]
    img = tiles[:, :, :4].reshape(gy, gx, ts, ts, 4)
    img = img.transpose(0, 2, 1, 3, 4).reshape(gy * ts, gx * ts, 4)
    return img[:h, :w], t_final
