"""Block-hierarchical frame preparation for the TPU fast path.

Design rationale (measured on v5e, see SURVEY.md §7 hard parts): XLA's global
sort (~0.36 Gkeys/s), gather and scatter (~0.1-0.15 Gelem/s) make the
reference's pair-level pipeline (sort 10-30M duplicated keys, gather 48 B
payload rows per pair — gsplat_projection.glsl:216-226, radix_sort_*.glsl)
untenable on TPU. The one fast data-movement primitive is the *batched
row-wise sort* (~3 Gkeys/s, and variadic payload operands ride along almost
free). So the fast path never builds per-pair structures:

  * splats are Morton-ordered once at load into fixed blocks of BLOCK_SIZE;
  * per frame, each block's splats are depth-sorted by one variadic row sort
    (payload permuted in the same op);
  * per-block tile rects / min depth come from block reductions;
  * tiles bin whole *blocks* (~100-300K tile-block pairs instead of 10-30M
    splat-tile pairs), via row-sort-as-compaction (ops/binning.py);
  * the render kernel streams contiguous block payloads (no gathers) and
    relies on exp(-large) ≈ 0 to neutralize block members outside the tile.

Ordering semantics: within a block, exact 16-bit depth order (same key as
gsplat_projection.glsl:218); across blocks in a tile, ordered by block min
depth. Cross-block inversions are bounded by block depth-range overlap; the
PSNR-vs-exact test gates the quality (the reference's own equal-key order is
GPU-race nondeterministic, so bit-exactness was never defined).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RasterizerConfig
from .projection import ProjectedSplats

BLOCK_SIZE = 128          # splats per block (tight rects vs DMA efficiency)
PAYLOAD_WIDTH = 12        # f32 lanes per splat payload row

# payload row layout: [ipos_x, ipos_y, conic_a, conic_b, conic_c,
#                      r, g, b, opacity, depth16, radius, pad]
_CULL_FAR = -1.0e6        # culled splats park far off-screen: exp(-huge) == 0


def morton_order(means: np.ndarray, bits: int = 10) -> np.ndarray:
    """Host-side Morton (Z-curve) argsort of splat positions. Run once at
    load; gives blocks spatial locality so their projected rects stay tight.
    Uses the native C++ kernel (native/plyio.cpp) when available."""
    try:
        from ..native import available, morton3
        if available():
            return np.argsort(morton3(np.asarray(means, np.float32)),
                              kind="stable")
    except Exception:
        pass
    p = np.asarray(means, np.float64)
    lo = p.min(axis=0)
    span = np.maximum(p.max(axis=0) - lo, 1e-9)
    q = np.clip(((p - lo) / span * (2**bits - 1)), 0, 2**bits - 1).astype(np.uint64)

    def spread(x):
        x &= 0x3FF
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2))
    return np.argsort(code, kind="stable")


class BlockFrame(NamedTuple):
    """Per-frame block-level state feeding binning + render."""

    payload: jnp.ndarray      # (B, PAYLOAD_WIDTH, S) f32, depth-sorted per block;
                              # rows: [ipos_x, ipos_y, conic_a, conic_b,
                              #        conic_c, r, g, b, opacity, depth16,
                              #        radius, 0]
    pos: jnp.ndarray          # (B, 3, S) f32 world positions (picking channel)
    rect: jnp.ndarray         # (B, 4) i32 block tile rect [x0, y0, x1, y1)
    bitmap: jnp.ndarray       # (B,) u32 8×4 coverage bitmap over the rect
    min_depth: jnp.ndarray    # (B,) u32 min depth16 over valid members
    num_valid: jnp.ndarray    # (B,) i32 surviving splats per block
    num_culled_pairs: jnp.ndarray  # () i32 — splat-tile pair count (stats parity
                                   # with the reference's sort_buffer_size)


SUPERBLOCK = 16384  # splats re-clustered together per frame (128 blocks)
CELL_SHIFT = 1     # screen-cluster cell edge in tiles = 2^CELL_SHIFT
BIG_RADIUS = 32.0  # px; splats at least this wide cluster depth-major


def build_block_frame(prj: ProjectedSplats, cfg: RasterizerConfig) -> BlockFrame:
    """ProjectedSplats (padded P = B*S splats, Morton order) → BlockFrame.

    Per-frame screen-space re-clustering: within each Morton *superblock* of
    SUPERBLOCK splats, splats are sorted by (center-tile, depth16) — one
    variadic row sort — and then cut into blocks of S. Because Morton
    superblocks are spatially local, the sorted runs make each block cover a
    handful of adjacent tiles at consecutive depths: tight rects (low render
    dilution) and near-sequential cross-block depth order within a tile. This
    is the TPU answer to the reference's global per-pair radix sort.
    """
    S = BLOCK_SIZE
    P = prj.valid.shape[0]
    sb_size = min(SUPERBLOCK, P)   # sharded callers may pass < SUPERBLOCK
    assert P % sb_size == 0, (
        f"splat capacity {P} must be a multiple of {sb_size}")
    B = P // S
    SB = P // sb_size
    gx, _ = cfg.tile_dims

    valid_sb = prj.valid.reshape(SB, sb_size)
    depth_sb = prj.depth16.reshape(SB, sb_size).astype(jnp.uint32)
    ipos_sb = prj.image_pos.reshape(SB, sb_size, 2)
    ts = float(cfg.tile_size)
    _, gy = cfg.tile_dims
    # Cluster cell = 2^CELL_SHIFT × 2^CELL_SHIFT tiles. Finer cells → tighter
    # block rects (less render dilution); coarser cells → longer depth-sorted
    # runs (fewer cross-block inversions). 1 (= 32px cells) balances both.
    cell = CELL_SHIFT
    ctx = (jnp.clip((ipos_sb[..., 0] / ts).astype(jnp.int32), 0, gx - 1)
           .astype(jnp.uint32) >> cell)
    cty = (jnp.clip((ipos_sb[..., 1] / ts).astype(jnp.int32), 0, gy - 1)
           .astype(jnp.uint32) >> cell)

    # 2D Morton code of the center tile (8+8 bits covers grids to 256×256
    # tiles = 4K): consecutive sorted splats are 2D-adjacent on screen, so
    # blocks get compact square-ish rects. Plain row-major tile ids would
    # wrap rows and blow block rects up to full image width.
    def spread8(v):
        v = (v | (v << 4)) & jnp.uint32(0x0F0F)
        v = (v | (v << 2)) & jnp.uint32(0x3333)
        v = (v | (v << 1)) & jnp.uint32(0x5555)
        return v

    morton = spread8(ctx & 0xFF) | (spread8(cty & 0xFF) << 1)

    # Big-splat segregation: a single wide splat in a block inflates the
    # whole block's rect union (the binning must be conservative), multiplying
    # render dilution, and its depth range wrecks min-depth ordering. Splats
    # with radius ≥ BIG_RADIUS px sort into a separate key region (bit 31),
    # clustered depth-major so big blocks stay depth-thin and order well.
    radius_sb = prj.radius.reshape(SB, sb_size)
    big = radius_sb >= BIG_RADIUS
    key_small = ((morton & 0x7FFF) << 16) | depth_sb
    key_big = (jnp.uint32(0x80000000) | (depth_sb << 8)
               | ((morton >> 8) & 0xFF))
    key = jnp.where(valid_sb, jnp.where(big, key_big, key_small),
                    jnp.uint32(0xFFFFFFFF))

    ipos = ipos_sb
    conic = prj.conic.reshape(SB, sb_size, 3)
    color = prj.color.reshape(SB, sb_size, 4)
    valid = valid_sb

    opacity = jnp.where(valid, color[..., 3], 0.0)
    px = jnp.where(valid, ipos[..., 0], _CULL_FAR)
    py = jnp.where(valid, ipos[..., 1], _CULL_FAR)
    ca = jnp.where(valid, conic[..., 0], 1.0)
    cb = jnp.where(valid, conic[..., 1], 0.0)
    cc = jnp.where(valid, conic[..., 2], 1.0)

    wpos = prj.pos.reshape(SB, sb_size, 3)
    # Culled splats keep radius 0: with ipos parked far away the rect-coverage
    # test in the kernel rejects them for every tile, and radius > 0 doubles
    # as the validity flag after the sort.
    radius = jnp.where(valid, prj.radius.reshape(SB, sb_size), 0.0)

    operands = (key, px, py, ca, cb, cc,
                color[..., 0], color[..., 1], color[..., 2], opacity,
                depth_sb.astype(jnp.float32), radius,
                wpos[..., 0], wpos[..., 1], wpos[..., 2])
    sorted_ops = jax.lax.sort(operands, dimension=1, num_keys=1,
                              is_stable=True)

    def blk(x):  # (SB, SUPERBLOCK[, ...]) → (B, S[, ...])
        return x.reshape(B, S, *x.shape[2:])

    pos_sorted = jnp.stack([blk(o) for o in sorted_ops[12:15]], axis=1)
    pay = jnp.stack([blk(o) for o in sorted_ops[1:12]], axis=1)   # (B, 11, S)
    pad = jnp.zeros((B, PAYLOAD_WIDTH - pay.shape[1], S), pay.dtype)
    payload = jnp.concatenate([pay, pad], axis=1)                 # (B, PW, S)

    # Per-splat rects are recomputed from the sorted payload instead of
    # riding the sort as four more operands (cheaper: the variadic sort is
    # the dominant cost of this stage). Formula identical to
    # ops/projection.py / get_rect (gsplat_projection.glsl:144-148); culled
    # splats (radius 0, parked at _CULL_FAR) produce empty rects.
    spx = pay[:, 0]
    spy = pay[:, 1]
    srad = pay[:, 10]
    svalid = srad > 0.0
    gxf = jnp.float32(gx)
    gyf = jnp.float32(gy)
    srx0 = jnp.clip((spx - srad) / ts, 0.0, gxf).astype(jnp.int32)
    sry0 = jnp.clip((spy - srad) / ts, 0.0, gyf).astype(jnp.int32)
    srx1 = jnp.clip(jnp.ceil((spx + srad) / ts), 0.0, gxf).astype(jnp.int32)
    sry1 = jnp.clip(jnp.ceil((spy + srad) / ts), 0.0, gyf).astype(jnp.int32)
    big = jnp.int32(1 << 20)
    srx0 = jnp.where(svalid, srx0, big)
    sry0 = jnp.where(svalid, sry0, big)
    srx1 = jnp.where(svalid, srx1, -big)
    sry1 = jnp.where(svalid, sry1, -big)
    sdepth = pay[:, 9].astype(jnp.uint32)        # (B, S) depth lane

    lo = jnp.stack([jnp.min(srx0, axis=1), jnp.min(sry0, axis=1)], -1)
    hi = jnp.stack([jnp.max(srx1, axis=1), jnp.max(sry1, axis=1)], -1)
    empty = ~jnp.any(svalid, axis=1)
    block_rect = jnp.where(
        empty[:, None],
        jnp.zeros((B, 4), jnp.int32),
        jnp.concatenate([lo, jnp.maximum(hi, lo)], axis=-1).astype(jnp.int32))

    # 8×4 coverage bitmap over the block rect: a block whose members cluster
    # in a few spots of a wide rect (Morton-jump stragglers, depth spread)
    # must not bin into every tile of the rect union. Bit (y, x) is set when
    # any member rect intersects that subcell; binning tests the tile's
    # subcell bit (ops/binning.py).
    bx0g, by0g = block_rect[:, 0:1], block_rect[:, 1:2]
    sw = jnp.maximum(-(-(block_rect[:, 2:3] - bx0g) // 8), 1)
    sh_ = jnp.maximum(-(-(block_rect[:, 3:4] - by0g) // 4), 1)
    cx0 = jnp.clip((srx0 - bx0g) // sw, 0, 7)
    cx1 = jnp.clip(-(-(srx1 - bx0g) // sw), cx0 + 1, 8)
    cy0 = jnp.clip((sry0 - by0g) // sh_, 0, 3)
    cy1 = jnp.clip(-(-(sry1 - by0g) // sh_), cy0 + 1, 4)
    colmask = ((jnp.uint32(1) << cx1.astype(jnp.uint32))
               - (jnp.uint32(1) << cx0.astype(jnp.uint32)))
    bits = jnp.zeros_like(colmask)
    for yrow in range(4):
        bits = bits | jnp.where(
            (cy0 <= yrow) & (yrow < cy1), colmask << (8 * yrow), 0)
    bits = jnp.where(svalid, bits, 0)
    bitmap = jax.lax.reduce(bits, jnp.uint32(0), jax.lax.bitwise_or, (1,))

    # Ordering key for a tile's covering blocks: the *mean* valid depth
    # ranks depth-overlapping (impure/margin) blocks better than the min —
    # a min is dominated by a single near outlier. Pure blocks (disjoint
    # depth ranges) order identically either way.
    nv = jnp.maximum(jnp.sum(svalid, axis=1), 1)
    min_depth = (jnp.sum(jnp.where(svalid, sdepth, 0), axis=1) // nv.astype(
        jnp.uint32)).astype(jnp.uint32)
    min_depth = jnp.where(jnp.any(svalid, axis=1), min_depth,
                          jnp.uint32(0xFFFFFFFF))
    num_valid = jnp.sum(svalid, axis=1).astype(jnp.int32)
    return BlockFrame(
        payload=payload,
        pos=pos_sorted,
        rect=block_rect,
        bitmap=bitmap,
        min_depth=min_depth,
        num_valid=num_valid,
        num_culled_pairs=jnp.sum(prj.num_tiles).astype(jnp.int32),
    )
