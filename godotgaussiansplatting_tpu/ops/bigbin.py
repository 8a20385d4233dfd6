"""Per-tile big-splat lane binning (v3/v4 fast path).

Bins the extracted BigSet lanes (ops/blocks2.py) per render GROUP of
horizontally contiguous tiles at LANE granularity — the reference's own
structure (one duplicated sort pair per covered tile,
gsplat_projection.glsl:161's rect expansion + radix_sort_*.glsl's global
order) applied to only the ~0.5% big subset where block sharing loses.
GROUP is 1 (see the measured note below), so in practice each TILE gets
an exactly depth-sorted, 100%-occupancy lane list; the render kernel
keeps it resident and blends it exactly against the tile's chain stream
(ops/render_pallas3.py, ops/render_pallas4.py); a per-lane coverage gate
scopes lanes to the pixels they actually reach.

Same two-level supertile compaction as ops/binning2.py, keyed by depth16 so
per-group lists come out front-to-back. Groups whose big count exceeds
`obig` keep the closest `obig` lanes (the dropped tail is the
most-occluded; the reference never drops — counted in `overflow`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterizerConfig
from .blocks2 import DEPTH_INVALID, GATE_OFF, PAYLOAD_WIDTH, _CULL_FAR
from .binning2 import SUPER


GROUP = 1  # tiles per render group (horizontal strip; render_pallas3).
# Measured at the 5.8M/1080p headline: GROUP=4 amortizes per-tile fixed
# costs (row DMA, present) but the shared big list grows to ~156 lanes/group
# (vs ~95/tile) and the pre-pass/straddle matmuls then run over 4x the
# pixels — render regressed 65.5 -> 73.1 ms. The machinery stays
# parameterized; 1 is the measured optimum.


class TileBigs(NamedTuple):
    bigpay: jnp.ndarray     # (TG, PW, OBIG) f32 per-GROUP gathered lane
                            # payloads, front-to-back; dead lanes sanitized
    tile_nbig: jnp.ndarray  # (TG,) i32 per-group live lane count
    overflow: jnp.ndarray   # () i32 group-lane pairs dropped by caps
    big_prefix: jnp.ndarray  # (TG, 128) i32 inclusive prefix count of live
                            # lanes over 128 depth16 buckets (depth >> 9) —
                            # the render kernel's straddle gate reads
                            # prefix[bmax>>9] - prefix[bmin>>9 - 1] to fire
                            # the exact-exchange matmuls only when a big
                            # lane actually lands in a chain batch's depth
                            # range (the old per-tile 32-bucket occupancy
                            # mask fired near-always at headline density)


def bin_bigs(
    bigs,                       # BigSet
    cfg: RasterizerConfig,
    obig: int = 128,
    supertile_cap: int = 2048,
    tile_row_offset=0,
) -> TileBigs:
    """Per-GROUP big-lane lists (GROUP=1 -> per TILE in practice): lanes
    covering any tile of the GROUPx1 window are included, exactly
    depth-sorted, and kept resident by the render kernel; its per-lane
    coverage gate scopes them to the pixels they actually reach."""
    gx, gy = cfg.tile_dims
    gx2 = -(-gx // GROUP)
    TG = gx2 * gy
    N = bigs.table.shape[0]
    C1 = min(supertile_cap, N)
    OB = min(obig, C1)

    sgx = -(-gx // SUPER)
    sgy = -(-gy // SUPER)
    NS = sgx * sgy

    r = bigs.rect
    sid = jnp.arange(NS, dtype=jnp.int32)
    ssx = (sid % sgx)[:, None]
    ssy = (sid // sgx)[:, None]
    sup_x0 = ssx * SUPER
    sup_y0 = ssy * SUPER + tile_row_offset
    covers = ((r[:, 0][None] < sup_x0 + SUPER) & (r[:, 2][None] > sup_x0)
              & (r[:, 1][None] < sup_y0 + SUPER) & (r[:, 3][None] > sup_y0)
              & bigs.valid[None])                   # (NS, N)

    # The big table is built globally depth-sorted (ops/blocks2: the
    # extraction sort is stable on depth16 with ascending source order at
    # ties), so LANE INDEX == (depth, idx) rank: the L1 compaction sorts a
    # single position key and the compacted positions ARE the front-to-back
    # candidate lanes. (Round 2 carried (depth16, lane) = 2 operands.)
    lane_inf = jnp.uint32(N)
    key1 = jnp.where(covers,
                     jax.lax.broadcasted_iota(jnp.uint32, (NS, N), 1),
                     lane_inf)
    (k1s,) = jax.lax.sort((key1,), dimension=1, num_keys=1, is_stable=True)
    k1s = k1s[:, :C1]
    cand_valid = k1s != lane_inf
    cand = jnp.where(cand_valid, k1s, 0)
    over_l1 = jnp.sum(covers) - jnp.sum(cand_valid)

    rects_c = r[cand.astype(jnp.int32)]             # (NS, C1, 4)

    # group windows inside the supertile: SUPER/GROUP x-strips per row
    GPR = SUPER // GROUP                            # groups per tile row
    NGS = SUPER * GPR                               # group windows / supertile
    gxi = jnp.arange(GPR, dtype=jnp.int32)
    gyi = jnp.arange(SUPER, dtype=jnp.int32)
    wx0 = ssx[:, 0][:, None] * SUPER + gxi[None] * GROUP     # (NS, GPR)
    wy = ssy[:, 0][:, None] * SUPER + gyi[None] + tile_row_offset
    wxx = jnp.broadcast_to(wx0[:, None, :], (NS, SUPER, GPR))
    wyy = jnp.broadcast_to(wy[:, :, None], (NS, SUPER, GPR))
    wxx = wxx.reshape(NS, NGS)
    wyy = wyy.reshape(NS, NGS)

    covers_t = ((rects_c[:, None, :, 0] < wxx[:, :, None] + GROUP)
                & (wxx[:, :, None] < rects_c[:, None, :, 2])
                & (rects_c[:, None, :, 1] <= wyy[:, :, None])
                & (wyy[:, :, None] < rects_c[:, None, :, 3])
                & cand_valid[:, None])              # (NS, NGS, C1)

    # fold (pos-in-C1, lane) into ONE sort key: pos in the high bits keeps
    # the front-to-back order, the lane rides in the low 16 bits (big_cap
    # <= 40960 < 2^16 — guarded in bin_bigs' caller via default_big_cap;
    # larger caps would need the 2-operand form)
    assert N <= 0xFFFF, "big_cap beyond 65535 needs a second sort operand"
    pos = jnp.broadcast_to(
        jnp.arange(C1, dtype=jnp.uint32)[None, None], covers_t.shape)
    key2 = jnp.where(covers_t,
                     (pos << 16) | jnp.broadcast_to(cand[:, None],
                                                    covers_t.shape),
                     jnp.uint32(C1) << 16)
    (k2s,) = jax.lax.sort((key2,), dimension=2, num_keys=1, is_stable=True)
    k2s = k2s[:, :, :OB]
    hit = (k2s >> 16) != C1
    sel = jnp.where(hit, k2s & 0xFFFF, 0).astype(jnp.int32)
    nbig = jnp.sum(covers_t, axis=2).astype(jnp.int32)
    over_l2 = jnp.sum(jnp.maximum(nbig - OB, 0))
    nbig = jnp.minimum(nbig, OB)

    def to_tiles(a):
        extra = a.shape[2:] if a.ndim > 2 else ()
        a = a.reshape(sgy, sgx, SUPER, GPR, *extra)
        a = jnp.moveaxis(a, 2, 1)
        a = a.reshape(sgy * SUPER, sgx * GPR, *extra)
        return a[:gy, :gx2].reshape(TG, *extra)

    sel_t = to_tiles(sel)                           # (TG, OB)
    hit_t = to_tiles(hit)                           # (TG, OB)

    tp = bigs.table[sel_t.reshape(-1)]              # (TG*OB, PW)
    tp = tp.reshape(TG, OB, PAYLOAD_WIDTH).transpose(0, 2, 1)  # (TG, PW, OB)
    dead = jnp.array(
        [GATE_OFF] + [0.0] * 8
        + [_CULL_FAR, _CULL_FAR, 0.0, DEPTH_INVALID, 0.0, 0.0, 0.0],
        jnp.float32)
    tp = jnp.where(hit_t[:, None, :], tp, dead[None, :, None])

    # per-group depth-bucket histogram -> inclusive prefix (see TileBigs)
    d_i = jnp.clip(tp[:, 12, :], 0.0, 65535.0).astype(jnp.int32) >> 9
    bkt = jax.lax.broadcasted_iota(jnp.int32, (1, 128, 1), 1)
    hist = jnp.sum((d_i[:, None, :] == bkt) & hit_t[:, None, :],
                   axis=2).astype(jnp.int32)                   # (TG, 128)
    prefix = jnp.cumsum(hist, axis=1)

    return TileBigs(
        bigpay=tp,
        tile_nbig=to_tiles(nbig),
        overflow=(over_l1 + over_l2).astype(jnp.int32),
        big_prefix=prefix,
    )
