"""Two-level tile binning v2: packed operands + merge metadata.

Supertile row-sort compaction, then per-tile compaction — replacing the
reference's radix sort + boundary extraction (radix_sort_*.glsl /
gsplat_boundaries.glsl) at BLOCK granularity:

  * tile lists are ordered by block MIN depth (the v3 kernel composites
    blocks in list order; its batch depth-indicator matmul and gated
    lag-1 corrections make the interleaving exact within ±1 batch);
  * the level-1 sort key packs (min_depth<<16 | max_depth), so the depth
    range rides the sort for free and reaches the per-tile rows;
  * rect (4x8 bits) and nv (8 bits into the block id word) are packed,
    cutting sort operand traffic ~2x (feature centers ride the payload,
    rows 14/15, so no center operand at all).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterizerConfig
from .blocks2 import BlockFrame2

SUPER = 8  # tiles per supertile edge


class TileBins2(NamedTuple):
    tile_blocks: jnp.ndarray     # (T, C2) i32 covering block ids, -1 padded,
                                 # front-to-back by block min depth
    tile_nblocks: jnp.ndarray    # (T,) i32
    tile_minmax: jnp.ndarray     # (T, C2) i32 packed min16<<16|max16
    tile_candidates: jnp.ndarray  # (T,) i32 candidate splat count (heatmap~)
    overflow: jnp.ndarray        # () i32 tile-block pairs dropped by caps


def bin_blocks2(
    bf: BlockFrame2,
    cfg: RasterizerConfig,
    supertile_cap: int = 1024,
    tile_cap: int = 256,
    tile_row_offset=0,
) -> TileBins2:
    gx, gy = cfg.tile_dims
    T = gx * gy
    B = bf.rect.shape[0]
    C1 = min(supertile_cap, B)
    C2 = min(tile_cap, C1)
    assert gx <= 255 and gy <= 255, "packed rects assume tile grids <= 255"

    sgx = -(-gx // SUPER)
    sgy = -(-gy // SUPER)
    NS = sgx * sgy

    # --- global pre-sort of block metadata by (min,max) depth ---------------
    # ONE small B-sized sort up front lets the per-supertile L1 compaction
    # below carry a single POSITION key (ascending position == ascending
    # depth) instead of 4 payload operands — row-sort cost scales with
    # operand traffic (see ops/blocks.py), and (NS, C1) candidate gathers
    # are tiny by comparison.
    minmax = (bf.min_depth << 16) | (bf.max_depth & 0xFFFF)
    import os as _os
    if _os.environ.get("GS_BIN_ORDER", "min") == "mid":
        # sweep-only trace-time knob: order tile lists by depth MIDPOINT
        # instead of min — wide spill blocks then split their ordering
        # error between too-early and too-late instead of all-late
        okey = (((bf.min_depth + bf.max_depth) >> 1) << 16) | (
            bf.max_depth & 0xFFFF)
    else:
        okey = minmax
    _, gidx = jax.lax.sort(
        (okey, jnp.arange(B, dtype=jnp.uint32)),
        dimension=0, num_keys=1, is_stable=True)
    gidx = gidx.astype(jnp.int32)
    r = bf.rect[gidx]                               # (B, 4), depth-ordered
    nonempty = (r[:, 2] > r[:, 0]) & (r[:, 3] > r[:, 1])

    sid = jnp.arange(NS, dtype=jnp.int32)
    ssx = (sid % sgx)[:, None]
    ssy = (sid // sgx)[:, None]
    sup_x0 = ssx * SUPER
    sup_y0 = ssy * SUPER + tile_row_offset
    covers = ((r[:, 0][None] < sup_x0 + SUPER) & (r[:, 2][None] > sup_x0)
              & (r[:, 1][None] < sup_y0 + SUPER) & (r[:, 3][None] > sup_y0)
              & nonempty[None])                     # (NS, B)

    inf = jnp.uint32(0xFFFFFFFF)
    pos_inf = jnp.uint32(B)
    key1 = jnp.where(covers,
                     jax.lax.broadcasted_iota(jnp.uint32, (NS, B), 1),
                     pos_inf)
    (k1s,) = jax.lax.sort((key1,), dimension=1, num_keys=1, is_stable=True)
    k1s = k1s[:, :C1]
    cand_valid = k1s != pos_inf                     # (NS, C1)
    cpos = jnp.where(cand_valid, k1s, 0).astype(jnp.int32)
    cand_gidx = gidx[cpos]                          # (NS, C1) block ids
    ru = r.astype(jnp.uint32)
    rect_sorted = (ru[:, 0] | (ru[:, 1] << 8) | (ru[:, 2] << 16)
                   | (ru[:, 3] << 24))
    bid_nv_sorted = (cand_gidx.astype(jnp.uint32)
                     | (bf.num_valid[cand_gidx].astype(jnp.uint32) << 24))
    cand_bidnv = jnp.where(cand_valid, bid_nv_sorted, inf)
    cand_rect = rect_sorted[cpos]
    cbm = bf.bitmap[gidx][cpos]
    k1s = jnp.where(cand_valid, minmax[cand_gidx], inf)
    n_cover_total = jnp.sum(covers)
    n_kept_l1 = jnp.sum(cand_valid)

    cx0 = (cand_rect & 0xFF).astype(jnp.int32)
    cy0 = ((cand_rect >> 8) & 0xFF).astype(jnp.int32)
    cx1 = ((cand_rect >> 16) & 0xFF).astype(jnp.int32)
    cy1 = ((cand_rect >> 24) & 0xFF).astype(jnp.int32)

    lx = jnp.arange(SUPER, dtype=jnp.int32)
    tgx = ssx[:, 0][:, None] * SUPER + lx[None]     # (NS, SUPER)
    tgy = ssy[:, 0][:, None] * SUPER + lx[None] + tile_row_offset
    txx = jnp.broadcast_to(tgx[:, None, :], (NS, SUPER, SUPER))
    tyy = jnp.broadcast_to(tgy[:, :, None], (NS, SUPER, SUPER))
    txx = txx.reshape(NS, SUPER * SUPER)
    tyy = tyy.reshape(NS, SUPER * SUPER)

    sw = jnp.maximum(-(-(cx1 - cx0) // 8), 1)[:, None, :]
    sh_ = jnp.maximum(-(-(cy1 - cy0) // 4), 1)[:, None, :]
    sbx = jnp.clip((txx[:, :, None] - cx0[:, None, :]) // sw, 0, 7)
    sby = jnp.clip((tyy[:, :, None] - cy0[:, None, :]) // sh_, 0, 3)
    bit = (cbm[:, None, :] >> (8 * sby + sbx).astype(jnp.uint32)) & 1
    covers_t = ((cx0[:, None, :] <= txx[:, :, None])
                & (txx[:, :, None] < cx1[:, None, :])
                & (cy0[:, None, :] <= tyy[:, :, None])
                & (tyy[:, :, None] < cy1[:, None, :])
                & (bit > 0)
                & cand_valid[:, None, :])           # (NS, 64, C1)

    # L2 compaction: the BLOCK ID rides the position key's low bits (pos is
    # unique along C1, so the id bits never perturb the order) and the
    # packed depth range rides as ONE extra sort operand. Device-measured
    # at the 5.8M/1080p headline: post-sort elementwise gathers of the two
    # payload words off the small (NS, C1) tables ran at ~7 cycles/element
    # (15.8 ms EACH for NS*64*C2 = 2.2M elements — the round-3 regression);
    # dragging one operand through the (NS, 64, C1) merge network is ~3 ms.
    bid_bits = 32 - (C1 + 1).bit_length()   # low bits available for the id
    assert B <= (1 << bid_bits), (
        f"{B} blocks exceed the {bid_bits}-bit id field at C1={C1}")
    pos = jnp.broadcast_to(
        jnp.arange(C1, dtype=jnp.uint32)[None, None], covers_t.shape)
    bid_bc = jnp.broadcast_to(
        cand_gidx.astype(jnp.uint32)[:, None], covers_t.shape)
    mm_bc = jnp.broadcast_to(k1s[:, None], covers_t.shape)
    key2 = jnp.where(covers_t, (pos << bid_bits) | bid_bc,
                     jnp.uint32(C1) << bid_bits)
    k2s, mm_s = jax.lax.sort((key2, mm_bc), dimension=2, num_keys=1)
    k2s = k2s[:, :, :C2]
    mm_s = mm_s[:, :, :C2]
    hit = (k2s >> bid_bits) != C1
    tb = jnp.where(hit,
                   (k2s & ((jnp.uint32(1) << bid_bits) - 1)).astype(
                       jnp.int32), -1)
    tmm = jnp.where(hit, mm_s, jnp.uint32(0xFFFFFFFF)).astype(jnp.int32)
    nb = jnp.sum(covers_t, axis=2).astype(jnp.int32)          # (NS, 64)
    ncand = jnp.sum(
        jnp.where(covers_t, (cand_bidnv[:, None] >> 24).astype(jnp.int32), 0),
        axis=2).astype(jnp.int32)
    n_kept_l2 = jnp.sum(jnp.minimum(nb, C2))
    nb = jnp.minimum(nb, C2)

    def to_tiles(a):
        extra = a.shape[2:] if a.ndim > 2 else ()
        a = a.reshape(sgy, sgx, SUPER, SUPER, *extra)
        a = jnp.moveaxis(a, 2, 1)
        a = a.reshape(sgy * SUPER, sgx * SUPER, *extra)
        return a[:gy, :gx].reshape(T, *extra)

    def to_tiles3(a):  # (NS, 64, C2)
        a = a.reshape(sgy, sgx, SUPER, SUPER, a.shape[2])
        a = jnp.moveaxis(a, 2, 1)
        a = a.reshape(sgy * SUPER, sgx * SUPER, a.shape[4])
        return a[:gy, :gx].reshape(T, a.shape[2])

    return TileBins2(
        tile_blocks=to_tiles3(tb),
        tile_nblocks=to_tiles(nb),
        tile_minmax=to_tiles3(tmm),
        tile_candidates=to_tiles(ncand),
        overflow=(n_cover_total - n_kept_l1).astype(jnp.int32)
        + (jnp.sum(covers_t) - n_kept_l2).astype(jnp.int32),
    )
