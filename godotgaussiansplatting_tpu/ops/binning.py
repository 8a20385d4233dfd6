"""Two-level tile binning of splat blocks, built on row-sort compaction.

Replaces the reference's radix-sort + boundary extraction
(radix_sort_*.glsl, gsplat_boundaries.glsl) for the fast path: instead of
grouping 10-30M duplicated splat keys, it groups ~20-50K *blocks* twice:

  level 1 (supertile, SUPER×SUPER tiles): for each supertile, a dense
     covers-mask over all blocks is compacted AND depth-ordered by one
     batched row sort (key = block min-depth where covering, ∞ elsewhere);
     the block's tile rect rides along as variadic payload so level 2 needs
     no gathers.
  level 2 (tile): each tile of a supertile masks its supertile's candidate
     list down to blocks whose rect covers the tile, compacted by a second
     row sort keyed on list position (stable → depth order preserved).

Everything is elementwise + batched row sorts + reshapes: no gather, no
scatter, no global sort (SURVEY.md §7 hard part (b) resolved by coarsening).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterizerConfig
from .blocks import BlockFrame

SUPER = 8  # tiles per supertile edge (128 px at tile_size 16)


class TileBins(NamedTuple):
    tile_blocks: jnp.ndarray     # (T, C2) i32 covering block ids, -1 padded,
                                 # front-to-back by block min depth
    tile_nblocks: jnp.ndarray    # (T,) i32
    tile_candidates: jnp.ndarray  # (T,) i32 candidate splat count (heatmap~)
    overflow: jnp.ndarray        # () i32 tile-block pairs dropped by caps


def bin_blocks(
    bf: BlockFrame,
    cfg: RasterizerConfig,
    supertile_cap: int = 1024,   # C1: max candidate blocks per supertile
    tile_cap: int = 256,         # C2: max blocks per tile
    tile_row_offset=0,           # first tile row of this grid slab (multi-chip:
                                 # block rects stay global, cfg covers the slab)
) -> TileBins:
    gx, gy = cfg.tile_dims
    T = gx * gy
    B = bf.rect.shape[0]
    C1 = min(supertile_cap, B)
    C2 = min(tile_cap, C1)

    sgx = -(-gx // SUPER)
    sgy = -(-gy // SUPER)
    NS = sgx * sgy

    # --- level 1: supertile candidate lists --------------------------------
    # Interval-overlap test in raw (global) tile units so a traced row offset
    # needs no SUPER alignment.
    r = bf.rect
    nonempty = (r[:, 2] > r[:, 0]) & (r[:, 3] > r[:, 1])

    sid = jnp.arange(NS, dtype=jnp.int32)
    ssx = (sid % sgx)[:, None]                      # (NS, 1)
    ssy = (sid // sgx)[:, None]
    sup_x0 = ssx * SUPER
    sup_y0 = ssy * SUPER + tile_row_offset
    covers = ((r[:, 0][None] < sup_x0 + SUPER) & (r[:, 2][None] > sup_x0)
              & (r[:, 1][None] < sup_y0 + SUPER) & (r[:, 3][None] > sup_y0)
              & nonempty[None])                     # (NS, B)

    inf = jnp.uint32(0xFFFFFFFF)
    key1 = jnp.where(covers, jnp.broadcast_to(bf.min_depth[None], (NS, B)), inf)
    bid = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None], (NS, B))
    ops = jax.lax.sort(
        (key1, bid,
         jnp.broadcast_to(r[:, 0][None], (NS, B)),
         jnp.broadcast_to(r[:, 1][None], (NS, B)),
         jnp.broadcast_to(r[:, 2][None], (NS, B)),
         jnp.broadcast_to(r[:, 3][None], (NS, B)),
         jnp.broadcast_to(bf.num_valid[None], (NS, B)),
         jnp.broadcast_to(bf.bitmap[None], (NS, B))),
        dimension=1, num_keys=1, is_stable=True)
    k1s = ops[0][:, :C1]
    cand_id, cx0, cy0, cx1, cy1, cnv, cbm = (o[:, :C1] for o in ops[1:])
    cand_valid = k1s != inf                         # (NS, C1)
    n_cover_total = jnp.sum(covers)
    n_kept_l1 = jnp.sum(cand_valid)

    # --- level 2: per-tile lists from the supertile candidates -------------
    lx = jnp.arange(SUPER, dtype=jnp.int32)
    tgx = ssx[:, 0][:, None] * SUPER + lx[None]     # (NS, SUPER) global tile x
    tgy = ssy[:, 0][:, None] * SUPER + lx[None] + tile_row_offset
    # (NS, SUPER, SUPER) grid → flatten local tiles to one axis of 64
    txx = jnp.broadcast_to(tgx[:, None, :], (NS, SUPER, SUPER))
    tyy = jnp.broadcast_to(tgy[:, :, None], (NS, SUPER, SUPER))
    txx = txx.reshape(NS, SUPER * SUPER)            # (NS, 64)
    tyy = tyy.reshape(NS, SUPER * SUPER)

    # Rect test + coverage-bitmap test (ops/blocks.py): the tile's subcell
    # bit must be set, pruning tiles under the empty parts of sparse rects.
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

    pos = jnp.broadcast_to(
        jnp.arange(C1, dtype=jnp.uint32)[None, None], covers_t.shape)
    key2 = jnp.where(covers_t, pos, jnp.uint32(C1))
    ops2 = jax.lax.sort(
        (key2, jnp.broadcast_to(cand_id[:, None], covers_t.shape)),
        dimension=2, num_keys=1, is_stable=True)
    tb = jnp.where(ops2[0][:, :, :C2] != C1, ops2[1][:, :, :C2], -1)  # (NS,64,C2)
    nb = jnp.sum(covers_t, axis=2).astype(jnp.int32)                  # (NS, 64)
    ncand = jnp.sum(jnp.where(covers_t, cnv[:, None], 0),
                    axis=2).astype(jnp.int32)
    n_kept_l2 = jnp.sum(jnp.minimum(nb, C2))
    nb = jnp.minimum(nb, C2)

    # --- (NS, 64, ·) → (T, ·) tile-major reassembly (pure reshapes) --------
    def to_tiles(a):
        extra = a.shape[2:]
        a = a.reshape(sgy, sgx, SUPER, SUPER, *extra)   # (sy, sx, ly, lx, ·)
        a = jnp.moveaxis(a, 2, 1)                        # (sy, ly, sx, lx, ·)
        a = a.reshape(sgy * SUPER, sgx * SUPER, *extra)
        return a[:gy, :gx].reshape(T, *extra)

    return TileBins(
        tile_blocks=to_tiles(tb),
        tile_nblocks=to_tiles(nb),
        tile_candidates=to_tiles(ncand),
        overflow=(n_cover_total - n_kept_l1).astype(jnp.int32)
        + (jnp.sum(covers_t) - n_kept_l2).astype(jnp.int32),
    )
