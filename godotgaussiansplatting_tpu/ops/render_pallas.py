"""Pallas TPU render kernel: per-tile compositing over depth-ordered blocks.

TPU-native counterpart of `gsplat_render.glsl`. Mapping of the reference's
machinery onto the TPU execution model:

  GPU workgroup per tile (16×16 threads)   → grid step per tile; 256 pixels
                                             live in vector sublanes
  shared-memory chunked splat loads        → double-buffered async DMA of
    (gsplat_render.glsl:66-77)               whole 128-splat block payloads
                                             (contiguous — no gathers)
  per-pixel sequential blend loop (:79-91) → per-block vectorized blend with
                                             an in-register lane cumprod for
                                             the intra-block transmittance
                                             chain (exact prefix products)
  cooperative saturation exit (:45-48,97)  → block-granular early-exit on
                                             max-lane transmittance
  heatmap overlay (:100-101)               → same formula, candidate counts
  picking side channel (:103-110)          → per-pixel final transmittance is
                                             returned as an output channel;
                                             position lookup happens host-side

Per-tile metadata (covering-block list + counts + heatmap bits) is packed
into one (8, 128) i32 row per tile — the minimal DMA-alignable unit — and
DMA'd HBM→SMEM one tile ahead of the compute (double buffered), because TPU
DMA slices must align to the (8, 128) tiling. The splat payload itself never
leaves HBM except through the per-block VMEM ring; splats of a block whose
radius-rect misses the tile are gated to exactly zero alpha (the reference
only emits pairs inside the rect, gsplat_projection.glsl:144-148).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MIN_FACTOR, RasterizerConfig
from .blocks import BLOCK_SIZE, PAYLOAD_WIDTH

NPX = 256          # pixels per tile (16×16)
OUT_CH = 8         # output channels per pixel: r, g, b, 1, t_final, pad…
PREFETCH = 4       # payload DMA ring depth
ROW_HDR = 8        # header slots in the packed per-tile row
ROW_SLOTS = 1024   # total i32 slots per row ((8, 128) DMA unit)
MAX_TILE_BLOCKS = ROW_SLOTS - ROW_HDR


def _lane_cumprod_exclusive(x):
    """Exclusive prefix product along the lane axis (length BLOCK_SIZE).

    Hillis-Steele doubling with pltpu.roll — log2(S) masked multiplies, no
    transcendentals (the log/exp-free analogue of the reference's sequential
    `t *= (1-alpha)` chain, gsplat_render.glsl:90)."""
    s = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    y = jnp.where(lane >= 1, pltpu.roll(x, 1, axis=len(x.shape) - 1), 1.0)
    k = 1
    while k < s:
        y = y * jnp.where(lane >= k, pltpu.roll(y, k, axis=len(x.shape) - 1), 1.0)
        k *= 2
    return y


def _render_kernel(
    rows_hbm,        # (T, 8, 128) i32 ANY — packed per-tile rows
    payload_hbm,     # (B, PW, S) f32 ANY — per-block splat payload
    out_ref,         # (1, NPX, OUT_CH) f32
    row_smem,        # SMEM (2, 8, 128) i32 — double-buffered tile rows
    pay_vmem,        # VMEM (PREFETCH, PW, S) f32
    row_sems,        # DMA sems (2,)
    sems,            # DMA sems (PREFETCH,)
    *, gx: int, tile_size: int, num_tiles: int, early_exit: bool,
):
    t = pl.program_id(0)
    slot_r = jax.lax.rem(t, 2)

    # Tile-row double buffering: step t waits for its own row (started at
    # step t-1; step 0 starts it itself) and prefetches row t+1.
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
    y_off = row_smem[slot_r, 0, 3]   # pixel-row offset (multi-chip slabs)
    # heatmap factor travels as 16.16 fixed point (scalar bitcast is not
    # supported by Mosaic).
    hm_f = row_smem[slot_r, 0, 2].astype(jnp.float32) * (1.0 / 65536.0)

    def block_id(j):
        k = j + ROW_HDR
        return row_smem[slot_r, k // 128, jax.lax.rem(k, 128)]

    # Pixel coordinates: p = py*16 + px, pixels along sublanes (NPX, 1).
    pix = jax.lax.broadcasted_iota(jnp.int32, (NPX, 1), 0)
    tile_x = (jax.lax.rem(t, gx) * tile_size).astype(jnp.float32)
    tile_y = ((t // gx) * tile_size + y_off).astype(jnp.float32)
    px = tile_x + jax.lax.rem(pix, tile_size).astype(jnp.float32)
    py = tile_y + (pix // tile_size).astype(jnp.float32)

    def start_dma(j, slot):
        pltpu.make_async_copy(
            payload_hbm.at[block_id(j)], pay_vmem.at[slot],
            sems.at[slot]).start()

    for d in range(PREFETCH):
        @pl.when(d < nb)
        def _(d=d):
            start_dma(d, d)

    min_alpha = 1.0 / MIN_FACTOR
    tsz = float(tile_size)

    def body(carry):
        j, t_px, acc = carry
        slot = jax.lax.rem(j, PREFETCH)
        pltpu.make_async_copy(
            payload_hbm.at[0], pay_vmem.at[slot], sems.at[slot]).wait()

        pay = pay_vmem[slot]                       # (PW, S)
        ix = pay[0:1, :]                           # (1, S)
        iy = pay[1:2, :]
        ca = pay[2:3, :]
        cb = pay[3:4, :]
        cc = pay[4:5, :]
        op = pay[8:9, :]
        rad = pay[10:11, :]

        # Exact rect-coverage gate (strict inequalities == floor/ceil of
        # get_rect, gsplat_projection.glsl:144-148): block members whose rect
        # misses this tile contribute exactly zero, not their gaussian tail.
        covered = ((ix - rad < tile_x + tsz) & (ix + rad > tile_x)
                   & (iy - rad < tile_y + tsz) & (iy + rad > tile_y))

        dx = ix - px                               # (NPX, S)
        dy = iy - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.where(covered, op * jnp.exp(power), 0.0)  # (:86)

        def exact_blend(alpha):
            p_excl = _lane_cumprod_exclusive(1.0 - alpha)
            t_cur = t_px * p_excl                  # (NPX, S) running t
            live = t_cur > min_alpha               # `t > MIN_ALPHA` (:79)
            w = jnp.where(live, alpha * t_cur, 0.0)
            t_new = t_px * jnp.min(
                jnp.where(live, p_excl * (1.0 - alpha), 1.0),
                axis=1, keepdims=True)             # (NPX, 1)
            return w, t_new

        def additive_blend(alpha):
            # Weak-block shortcut: when every alpha ≤ 1/2048 the intra-block
            # prefix products are 1 within ≤ S/2048 relative error, so the
            # O(S log S) transmittance chain collapses to an additive pass
            # (absolute pixel error < 1e-3 — below the oracle tolerance).
            live = t_px > min_alpha                # (NPX, 1)
            w = jnp.where(live, alpha * t_px, 0.0)
            # Π(1-αᵢ) ≈ 1-Σαᵢ for αᵢ ≤ 1/2048 (error ≤ (Σα)²/2 ≤ 0.2%;
            # Mosaic has no reduce_prod).
            total = jnp.maximum(
                1.0 - jnp.sum(alpha, axis=1, keepdims=True), 0.0)
            t_new = t_px * jnp.where(live, total, 1.0)
            return w, t_new

        w, t_new = jax.lax.cond(jnp.max(alpha) < (1.0 / 2048.0),
                                additive_blend, exact_blend, alpha)

        rgb = pay[5:8, :]                          # (3, S)
        acc = acc + jax.lax.dot_general(
            w, rgb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (NPX, 3)

        @pl.when(j + PREFETCH < nb)
        def _():
            start_dma(j + PREFETCH, slot)

        return j + 1, t_new, acc

    def cond(carry):
        j, t_px, _ = carry
        go = j < nb
        if early_exit:
            # Block-level cooperative exit (gsplat_render.glsl:45-48,97).
            go = jnp.logical_and(go, jnp.max(t_px) > min_alpha)
        return go

    init = (jnp.int32(0),
            jnp.ones((NPX, 1), jnp.float32),
            jnp.zeros((NPX, 3), jnp.float32))
    j_end, t_final, acc = jax.lax.while_loop(cond, body, init)

    # Drain in-flight DMAs an early exit leaves behind (started = min(nb,
    # j_end + PREFETCH), waited = j_end). No-op when the loop ran to nb.
    for d in range(PREFETCH):
        @pl.when(j_end + d < jnp.minimum(nb, j_end + PREFETCH))
        def _(d=d):
            slot = jax.lax.rem(j_end + d, PREFETCH)
            pltpu.make_async_copy(
                payload_hbm.at[0], pay_vmem.at[slot], sems.at[slot]).wait()

    # Heatmap overlay (gsplat_render.glsl:100-101): unclamped lerp blue→red.
    mixf = cand.astype(jnp.float32) * 5e-4
    cov = (1.0 - t_final) * hm_f                    # (NPX, 1)
    ch = jax.lax.broadcasted_iota(jnp.int32, (NPX, OUT_CH), 1)
    hm = jnp.where(ch == 0, 1.0 * mixf,
                   jnp.where(ch == 1, 0.2 * mixf,
                             jnp.where(ch == 2, 1.0 - 0.8 * mixf, 0.0))) * cov

    rgb_full = jnp.concatenate(
        [acc, jnp.zeros((NPX, OUT_CH - 3), jnp.float32)], axis=1)
    out = rgb_full + hm
    out = jnp.where(ch == 3, 1.0, out)
    out = jnp.where(ch == 4, t_final, out)
    out_ref[0] = out


def pack_tile_rows(tile_blocks, tile_nblocks, tile_candidates,
                   heatmap_factor, pixel_offset_y=0):
    """(T, C2) block lists + counts + traced heatmap factor → (T, 8, 128) i32
    packed rows: [nb, cand, hm_fixed16.16, y_off, 0…, blocks from ROW_HDR]."""
    T, C2 = tile_blocks.shape
    assert C2 <= MAX_TILE_BLOCKS
    hm_bits = jnp.round(
        jnp.asarray(heatmap_factor, jnp.float32) * 65536.0).astype(jnp.int32)
    yoff = jnp.broadcast_to(
        jnp.asarray(pixel_offset_y, jnp.int32).reshape(1, 1), (T, 1))
    hdr = jnp.concatenate([
        tile_nblocks.reshape(T, 1).astype(jnp.int32),
        tile_candidates.reshape(T, 1).astype(jnp.int32),
        jnp.broadcast_to(hm_bits.reshape(1, 1), (T, 1)),
        yoff,
        jnp.zeros((T, ROW_HDR - 4), jnp.int32),
    ], axis=1)
    body = jnp.concatenate([
        tile_blocks.astype(jnp.int32),
        jnp.zeros((T, MAX_TILE_BLOCKS - C2), jnp.int32),
    ], axis=1)
    return jnp.concatenate([hdr, body], axis=1).reshape(T, 8, 128)


def render_tiles_pallas(
    payload: jnp.ndarray,          # (B, PW, S) f32
    tile_blocks: jnp.ndarray,      # (T, C2) i32
    tile_nblocks: jnp.ndarray,     # (T,) i32
    tile_candidates: jnp.ndarray,  # (T,) i32
    heatmap_factor: jnp.ndarray,   # () f32
    cfg: RasterizerConfig,
    early_exit: bool = True,
    interpret: bool = False,
    pixel_offset_y=0,
):
    """Launch the per-tile kernel over the tile grid. Returns the raw
    (T, NPX, OUT_CH) tile buffer (assemble with `assemble_image`).
    pixel_offset_y shifts tile pixel rows (multi-chip slabs render a slice of
    a larger image whose image_pos coordinates are global)."""
    gx, gy = cfg.tile_dims
    T = gx * gy
    assert cfg.tile_size * cfg.tile_size == NPX

    rows = pack_tile_rows(tile_blocks, tile_nblocks, tile_candidates,
                          heatmap_factor, pixel_offset_y)
    kern = functools.partial(
        _render_kernel, gx=gx, tile_size=cfg.tile_size, num_tiles=T,
        early_exit=early_exit)

    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # packed rows (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),   # payload (HBM)
        ],
        out_specs=pl.BlockSpec((1, NPX, OUT_CH), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, NPX, OUT_CH), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((2, 8, 128), jnp.int32),
            pltpu.VMEM((PREFETCH, PAYLOAD_WIDTH, BLOCK_SIZE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((PREFETCH,)),
        ],
        interpret=interpret,
    )(rows, payload)


def assemble_image(tiles: jnp.ndarray, cfg: RasterizerConfig):
    """(T, NPX, OUT_CH) tile buffer → ((H, W, 4) image, (T, NPX) t_final)."""
    gx, gy = cfg.tile_dims
    ts = cfg.tile_size
    w, h = cfg.target_size
    t_final = tiles[:, :, 4]
    img = tiles[:, :, :4].reshape(gy, gx, ts, ts, 4)
    img = img.transpose(0, 2, 1, 3, 4).reshape(gy * ts, gx * ts, 4)
    return img[:h, :w], t_final
