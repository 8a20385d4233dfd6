"""Block frame: depth-sorted splat blocks carrying MXU power features.

Per-frame block preparation for the TPU fast path:

  * big splats (radius >= BIG_RADIUS) are extracted FIRST into a BigSet
    lane table (cheap per-superblock row sorts + one small global
    compaction) — they are binned per tile individually (ops/bigbin.py)
    because any block grouping gives them either whole-scene depth ranges
    or whole-screen rects;
  * stage 1 — per Morton superblock, ONE variadic row sort by
    (screen-cell Morton, depth16) groups the remaining splats into
    screen-local, depth-slabbed runs (7 operands: key, image xy, two f16
    bit-pairs for conic+opacity, rgb9e5 color, source index; depth and
    validity are recovered from the key);
  * blocks of BLOCK_SIZE are cut directly from the stage-1 order; lanes
    inside a block need NOT be depth-monotone — the render kernel's
    depth-indicator matrix orders all batch lanes by actual depth (with a
    list-order tie-break inside a block), which removed the round-2
    intra-block re-sort stage (a second 12-operand row sort);
  * the per-splat Gaussian power is factorized for the MXU:
        power(px, py) = f0 + px'·f1 + py'·f2 + px'²·f3 + py'²·f4 + px'py'·f5
    with (px', py') pixel coordinates relative to a stored per-lane center
    (payload rows 14/15) that bounds f32 cancellation; the render kernel
    re-centers the features to the tile origin and evaluates all NPX×S
    powers as ONE matmul (gsplat_render.glsl:84's per-thread evaluation).

Payload layout (PAYLOAD_WIDTH=16 f32 rows per block, shared by chain
blocks and BigSet lane tables):
    0..5   f0..f5   power features; f0 includes ln(opacity) (clamped to
                    <= -1e-3 so alpha < 1 strictly and log1p(-alpha) in the
                    kernel stays finite); invalid lanes: f0=-1e4, f1..f5=0
    6..8   r, g, b  SH color (invalid: 0)
    9..10  ix, iy  image position (invalid: parked at -1e6)
    11     rx|ry   anisotropic coverage half-widths as a bf16 bit-pair
                    (extents_from_conic; invalid: 0) for the per-lane
                    rect-coverage gate
    12     order rank (depth16<<16 | idx>>7)^sign, bitcast i32->f32, for
                    CHAIN blocks (one-compare ordering in the kernel);
                    BigSet lane tables keep plain depth16-as-f32 here
                    (the big pre-pass needs f32 depth for its bucket mask)
    13     idx      source splat index, bitcast u32->f32 (picking)
    14..15 bcx, bcy feature center (per-block mean for chains; per-lane
                    round(image_pos) for big lanes)

Reference parity notes: the per-splat math feeding the features reproduces
gsplat_projection.glsl exactly (see ops/projection.py); this module only
reshapes the frame into the TPU-native block hierarchy that replaces the
reference's global radix sort (radix_sort_*.glsl).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterizerConfig
from .projection import ProjectedSplats
from .blocks import morton_order, SUPERBLOCK, CELL_SHIFT, BIG_RADIUS  # noqa: F401

BLOCK_SIZE = 128          # splats per block
PAYLOAD_WIDTH = 16        # f32 lanes per splat payload row
DEPTH_INVALID = 3.0e38    # depth row sentinel for culled/padded lanes
GATE_OFF = -1.0e4         # exp(GATE_OFF) == 0 in f32
_CULL_FAR = -1.0e6


def _pack_f16(a, b):
    """Two f32 rows -> one u32 row of f16 bit-pairs (sort operand traffic).

    Safe for conic (<= ~3.3 after the reference's +0.3 dilation), radius
    (<= ~4K px), SH color and opacity: all well inside f16 range, and the
    5e-4 relative rounding is far below the fast path's PSNR gates."""
    ah = jax.lax.bitcast_convert_type(a.astype(jnp.float16), jnp.uint16)
    bh = jax.lax.bitcast_convert_type(b.astype(jnp.float16), jnp.uint16)
    return ah.astype(jnp.uint32) | (bh.astype(jnp.uint32) << 16)


def _unpack_f16(w):
    a = jax.lax.bitcast_convert_type((w & 0xFFFF).astype(jnp.uint16),
                                     jnp.float16)
    b = jax.lax.bitcast_convert_type((w >> 16).astype(jnp.uint16),
                                     jnp.float16)
    return a.astype(jnp.float32), b.astype(jnp.float32)


def _round_bf16(x):
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def _pack_rgb9e5(r, g, b):
    """Non-negative RGB -> one u32: 9-bit mantissas, shared 5-bit exponent.

    Stage-1 sort cost scales with operand traffic; rgb9e5 carries all three
    color channels in ONE word at <= 2^-9-of-max-channel absolute error
    (~65 dB quantization floor, far above the fast path's PSNR gates; the
    exact pipeline keeps full-precision color). Exponent via f32 bit tricks
    (no transcendentals): e = biased_exp - 126 gives 2^(e-1) <= m < 2^e."""
    m = jnp.maximum(jnp.maximum(r, g), b)
    eb = ((jax.lax.bitcast_convert_type(jnp.maximum(m, 1e-12), jnp.uint32)
           >> 23) & 0xFF).astype(jnp.int32) - 126       # ceil(log2 m)
    e = jnp.clip(eb, -15, 16)
    s = jnp.exp2((9 - e).astype(jnp.float32))

    def q(c):
        # via i32: value-identical on [0, 511], and Mosaic (which traces this
        # helper inside the projection kernel) has no f32->u32 lowering
        return jnp.clip(jnp.round(c * s), 0.0, 511.0).astype(
            jnp.int32).astype(jnp.uint32)

    return (q(r) | (q(g) << 9) | (q(b) << 18)
            | ((e + 15).astype(jnp.uint32) << 27))


def _unpack_rgb9e5(w):
    e = ((w >> 27) & 0x1F).astype(jnp.int32) - 15
    s = jnp.exp2((e - 9).astype(jnp.float32))

    def d(sh):
        return ((w >> sh) & 0x1FF).astype(jnp.float32) * s

    return d(0), d(9), d(18)


def _pack_bf16_pair(a, b):
    """Two (bf16-rounded) f32 arrays -> one f32 row of bf16 bit-pairs.

    Used for payload row 11 (rx | ry<<16): bf16 is TPU-native, so the render
    kernel unpacks with plain bitcasts (no f16 support needed in Mosaic)."""
    ah = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    bh = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(ah | (bh << 16), jnp.float32)


def extents_from_conic(ca, cb, cc, op):
    """Anisotropic alpha-reach half-widths (rx, ry) of the splat bbox.

    The reference bounds every splat by a SQUARE of half-width
    R = opacity^0.2 * 2.5 * sqrt(lambda_max)
    (gsplat_projection.glsl:187-190); the exact pipeline reproduces that
    square. For the fast path's coverage structures the square is too wide
    along the minor axis by the splat's aspect ratio, which inflates block
    rects, tile bins, big-lane lists and kernel batches alike. Per axis,
    everything beyond
        r_axis = sigma_axis * sqrt(2 * ln(255 * opacity))
    has alpha below 1/255 — the reference's own per-pixel termination
    threshold (gsplat_render.glsl:79) — so the cut is
        rx = min(R, sqrt(2 ln(255 op) * Sigma_xx)),  ry = ... Sigma_yy,
    with Sigma the 2D covariance (inverse of the conic quadratic
    [ca cb; cb cc]). The min keeps coverage inside the reference square
    (identical where the splat is round), and the excluded strips carry
    per-splat alpha < 1/255. Values are bf16-rounded so the rects built
    here and the render kernel's per-lane gate (which unpacks payload
    row 11) agree bit-exactly."""
    det = jnp.maximum(ca * cc - cb * cb, 1e-20)
    sxx = jnp.maximum(cc / det, 0.0)
    syy = jnp.maximum(ca / det, 0.0)
    # lambda_max of Sigma (for the reference square cap)
    m = 0.5 * (sxx + syy)
    lam = m + jnp.sqrt(jnp.maximum(m * m - 1.0 / det, 0.0))
    R = jnp.power(jnp.maximum(op, 0.0), 0.2) * 2.5 * jnp.sqrt(lam)
    vis = jnp.sqrt(2.0 * jnp.maximum(
        jnp.log(jnp.maximum(op, 1e-8) * 255.0), 0.125))
    rx = jnp.minimum(R, vis * jnp.sqrt(sxx))
    ry = jnp.minimum(R, vis * jnp.sqrt(syy))
    return _round_bf16(rx), _round_bf16(ry)


def adaptive_cell_shift(P: int, gx: int, gy: int,
                        blocks_per_cell: int = 8) -> int:
    """Smallest cell shift s (cell edge = 2^s tiles) such that each cell's
    depth column holds ~blocks_per_cell blocks of BLOCK_SIZE splats."""
    target_cells = max(P // (BLOCK_SIZE * blocks_per_cell), 1)
    s = 0
    while s < 8 and (-(-gx // (1 << s))) * (-(-gy // (1 << s))) > target_cells:
        s += 1
    return s


class BlockFrame2(NamedTuple):
    """Per-frame block-level state feeding binning + the v3 render kernel."""

    payload: jnp.ndarray      # (B, PAYLOAD_WIDTH, S) f32 — see module docstring
    rect: jnp.ndarray         # (B, 4) i32 block tile rect [x0, y0, x1, y1)
    bitmap: jnp.ndarray       # (B,) u32 8x4 coverage bitmap over the rect
    min_depth: jnp.ndarray    # (B,) u32 min depth16 over valid members
    max_depth: jnp.ndarray    # (B,) u32 max depth16 over valid members
    num_valid: jnp.ndarray    # (B,) i32 surviving splats per block
    num_culled_pairs: jnp.ndarray  # () i32 splat-tile pair count (stats parity
                                   # with the reference's sort_buffer_size)


class BigSet(NamedTuple):
    """Globally depth-sorted big-splat lanes (radius >= BIG_RADIUS).

    Big splats break the block hierarchy: grouped per-superblock they get
    whole-scene depth ranges, grouped by depth they get whole-screen rects —
    either way they dominated binning dilution and capped fast-path fidelity
    at ~36 dB in v2. v3 pulls them out of the chains entirely and bins them
    per TILE at lane granularity (ops/bigbin.py) — the reference's own
    structure (one duplicated sort pair per covered tile,
    gsplat_projection.glsl's rect expansion) applied to just the ~0.5% of
    splats where block sharing loses.
    """

    table: jnp.ndarray     # (big_cap, PW) f32 payload rows per lane; the
                           # feature center (rows 14/15) is round(image_pos)
                           # per lane, so px' stays in [-0.5, 0.5]
    depth16: jnp.ndarray   # (big_cap,) u32 (invalid = 0xFFFF)
    rect: jnp.ndarray      # (big_cap, 4) i32 per-lane tile rect
    valid: jnp.ndarray     # (big_cap,) bool
    residual: jnp.ndarray  # () i32 bigs beyond capacity (left in chains,
                           # rendered in approximate chain order)


def default_big_cap(P: int) -> int:
    """Static capacity of the extracted big-splat lane set.

    Capped at 40K lanes: the bigset gather and ops/bigbin.py's compaction
    scale with the CAPACITY (not the live count), and ~0.7% of the headline
    scene is big."""
    return min(P, max(BLOCK_SIZE * 8,
                      min(P // 64, 40960) // BLOCK_SIZE * BLOCK_SIZE))


def _big_chunk_width(P: int, sb_size: int) -> int:
    """Big-candidate chunk width: 1024 (25%-window headroom at 4x finer
    granularity than a superblock — see build_block_frame2's sizing note),
    falling back to smaller power-of-two divisors of P."""
    for c in (1024, 512, 256, 128):
        if P % c == 0:
            return min(c, sb_size)
    return sb_size


def _select_big_lanes(bkey: jnp.ndarray, big_cap: int):
    """Chunked big-candidate keys -> globally closest big_cap lanes.

    bkey: (R, CW) u32, ((depth16 << 10) | col-in-chunk) for candidates,
    0xFFFFFFFF otherwise. Returns (tk_idx (big_cap,) i32 flat source
    positions, tk_ok (big_cap,) bool). Candidates beyond a chunk's
    CW/4-wide window or the global cap are simply not taken (their splats
    stay in their chains; the caller counts them in BigSet.residual)."""
    R, CW = bkey.shape
    inf = jnp.uint32(0xFFFFFFFF)
    KC = min(CW, max(CW // 4, 4 * big_cap // max(R, 1)))
    (bk_s,) = jax.lax.sort((bkey,), dimension=1, num_keys=1)
    win = bk_s[:, :KC]
    row0 = (jnp.arange(R, dtype=jnp.uint32) * jnp.uint32(CW))[:, None]
    pos_w = jnp.where(win != inf, row0 + (win & 0x3FF), jnp.uint32(0))
    gks, gidx = jax.lax.sort(
        ((win >> 10).reshape(-1), pos_w.reshape(-1)),
        dimension=0, num_keys=1, is_stable=True)
    gks = jnp.where(gks == (inf >> 10), inf, gks)
    cap = min(big_cap, R * KC)
    tk_idx = gidx[:cap].astype(jnp.int32)
    tk_ok = gks[:cap] != inf
    if cap < big_cap:   # pad to the static big_cap
        tk_idx = jnp.concatenate(
            [tk_idx, jnp.zeros((big_cap - cap,), jnp.int32)])
        tk_ok = jnp.concatenate(
            [tk_ok, jnp.zeros((big_cap - cap,), bool)])
    return tk_idx, tk_ok


def _build_big_set(ops, ok, depth16, residual, gx, gy, ts):
    """Stage-1-sorted operand rows for the taken lanes -> BigSet."""
    ix, iy, ca, cb, cc, r, g, b, op, idx = ops
    valid = ok
    bcx = jnp.clip(jnp.round(ix), 0.0, 16383.0)
    bcy = jnp.clip(jnp.round(iy), 0.0, 16383.0)
    ixr = ix - bcx
    iyr = iy - bcy
    ln_op = jnp.minimum(jnp.log(jnp.maximum(op, 1e-37)), -1e-3)
    f0q = -0.5 * (ca * ixr * ixr + cc * iyr * iyr) - cb * ixr * iyr
    f0 = jnp.where(valid, f0q + ln_op, GATE_OFF)
    zero = jnp.zeros_like(ix)
    f1 = jnp.where(valid, ca * ixr + cb * iyr, zero)
    f2 = jnp.where(valid, cc * iyr + cb * ixr, zero)
    f3 = jnp.where(valid, -0.5 * ca, zero)
    f4 = jnp.where(valid, -0.5 * cc, zero)
    f5 = jnp.where(valid, -cb, zero)
    ix_p = jnp.where(valid, ix, _CULL_FAR)
    iy_p = jnp.where(valid, iy, _CULL_FAR)
    rx, ry = extents_from_conic(ca, cb, cc, op)
    rx_p = jnp.where(valid, rx, zero)
    ry_p = jnp.where(valid, ry, zero)
    depth_f = jnp.where(valid, (depth16 & 0xFFFF).astype(jnp.float32),
                        DEPTH_INVALID)
    idx_f = jax.lax.bitcast_convert_type(idx, jnp.float32)
    table = jnp.stack([
        f0, f1, f2, f3, f4, f5,
        jnp.where(valid, r, zero), jnp.where(valid, g, zero),
        jnp.where(valid, b, zero),
        ix_p, iy_p, _pack_bf16_pair(rx_p, ry_p), depth_f, idx_f, bcx, bcy,
    ], axis=1)                                     # (big_cap, PW)

    gxf, gyf = jnp.float32(gx), jnp.float32(gy)
    x0 = jnp.clip((ix_p - rx_p) / ts, 0.0, gxf).astype(jnp.int32)
    y0 = jnp.clip((iy_p - ry_p) / ts, 0.0, gyf).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil((ix_p + rx_p) / ts), 0.0, gxf).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil((iy_p + ry_p) / ts), 0.0, gyf).astype(jnp.int32)
    rect = jnp.where(valid[:, None],
                     jnp.stack([x0, y0, x1, y1], axis=-1),
                     jnp.zeros((ix.shape[0], 4), jnp.int32))
    return BigSet(table=table, depth16=depth16 & 0xFFFF, rect=rect,
                  valid=valid, residual=residual)


def build_block_frame2(prj: ProjectedSplats, cfg: RasterizerConfig,
                       num_splats: int | None = None,
                       big_cap: int | None = None,
                       words_payload: bool = False):
    """ProjectedSplats (padded P = B*S splats, Morton order) ->
    (BlockFrame2, BigSet).

    num_splats: true (unpadded) splat count, used only to pick the adaptive
    cell granularity; defaults to the padded capacity.
    big_cap: lane capacity of the big-splat extraction (see BigSet). Bigs
    beyond big_cap stay in their superblock chain (graceful order
    degradation, never dropped)."""
    S = BLOCK_SIZE
    P = prj.valid.shape[0]
    sb_size = min(SUPERBLOCK, P)
    assert P % sb_size == 0, (
        f"splat capacity {P} must be a multiple of {sb_size}")
    B = P // S
    SB = P // sb_size
    gx, gy = cfg.tile_dims
    ts = float(cfg.tile_size)

    valid_sb = prj.valid.reshape(SB, sb_size)
    depth_sb = prj.depth16.reshape(SB, sb_size).astype(jnp.uint32)
    ipos_sb = prj.image_pos.reshape(SB, sb_size, 2)

    # --- stage-1 composite key: (big-splat bit, cell Morton, depth16) -------
    # Adaptive cell granularity: a cell should hold several depth-slab
    # blocks, or cross-cell depth interleaving exceeds the render kernel's
    # ±1-list-position exactness window. Small scenes therefore get coarse
    # cells (few, deep depth columns); large scenes get fine cells (tight
    # rects, low render dilution).
    cell = adaptive_cell_shift(num_splats or P, gx, gy)
    ctx = (jnp.clip((ipos_sb[..., 0] / ts).astype(jnp.int32), 0, gx - 1)
           .astype(jnp.uint32) >> cell)
    cty = (jnp.clip((ipos_sb[..., 1] / ts).astype(jnp.int32), 0, gy - 1)
           .astype(jnp.uint32) >> cell)

    def spread8(v):
        v = (v | (v << 4)) & jnp.uint32(0x0F0F)
        v = (v | (v << 2)) & jnp.uint32(0x3333)
        v = (v | (v << 1)) & jnp.uint32(0x5555)
        return v

    morton = spread8(ctx & 0xFF) | (spread8(cty & 0xFF) << 1)

    inf = jnp.uint32(0xFFFFFFFF)
    conic = prj.conic.reshape(SB, sb_size, 3)
    color = prj.color.reshape(SB, sb_size, 4)
    idx = (jnp.arange(P, dtype=jnp.uint32).reshape(SB, sb_size))

    # --- big-lane extraction BEFORE clustering (per-tile lists, bigbin) -----
    # Compact big candidates per 1024-splat Morton CHUNK with a cheap
    # 1-operand row sort, then one small global sort picks the closest
    # big_cap lanes. Row-sort cost scales with log2(row width): chunked
    # rows (1024 -> 10 merge passes) measured 1.33 ms at the 5.8M headline
    # vs 3.52 ms for full 16384-superblock rows (14 passes). A full (P, 2)
    # GLOBAL sort measured ~11 ms, and windowed take_along_axis gathers
    # ~10 ms — both rejected. CHUNK/WINDOW SIZING IS FIDELITY-CRITICAL:
    # bigs cluster spatially, and candidates beyond a chunk's window stay
    # in their chains, poisoning block rects — 256-splat chunks with a
    # 12.5% window measured +11 ms on the RENDER stage at the headline
    # (the sorts saved only 4). 1024-splat chunks keep the old design's
    # 25% local headroom at 4x finer granularity. Extracted lanes are
    # keyed invalid for stage 1, so chains never see them; bigs beyond a
    # chunk window or big_cap stay in their chains (counted in residual —
    # graceful order degradation, never dropped).
    if big_cap is None:
        big_cap = default_big_cap(P)
    big_cap = max(big_cap, S)
    # bigness by the anisotropic max extent (<= the reference radius): a
    # sliver splat wide in one axis only can stay in its chain — the 8x4
    # bitmap culls its rect row cheaply
    rx_sb, ry_sb = extents_from_conic(conic[..., 0], conic[..., 1],
                                      conic[..., 2], color[..., 3])
    ext_sb = jnp.maximum(rx_sb, ry_sb)
    is_big = (ext_sb >= BIG_RADIUS) & valid_sb
    CW = _big_chunk_width(P, sb_size)
    R = P // CW                       # chunk rows
    # ONE-operand candidate sort: fold the column into the low bits of
    # the depth key (CW <= 1024 columns; depth16 <= 0xFFFE keeps every
    # valid key below the inf sentinel). Recovering (depth, column) from
    # the key halves the row-sort's operand traffic.
    colv = jnp.broadcast_to(
        jnp.arange(CW, dtype=jnp.uint32)[None], (R, CW))
    bkey = jnp.where(is_big.reshape(R, CW),
                     (depth_sb.reshape(R, CW) << 10) | colv, inf)
    tk_idx, tk_ok = _select_big_lanes(bkey, big_cap)
    taken = jnp.zeros((P,), bool).at[tk_idx].set(tk_ok).reshape(SB, sb_size)

    # Packed per-splat words, shared by the stage-1 sort operands AND the
    # big-lane extraction below: gathering the f16/rgb9e5 packed words (5
    # gathers + depth) instead of the ten raw f32 columns halves the
    # extraction's ~0.3 ms-per-gather cost at the headline, at the same
    # precision class the chain path already applies to every splat.
    u32 = lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32)  # noqa: E731
    payload_words = (
        u32(ipos_sb[..., 0]), u32(ipos_sb[..., 1]),
        _pack_f16(conic[..., 0], conic[..., 1]),
        _pack_f16(conic[..., 2], color[..., 3]),
        _pack_rgb9e5(color[..., 0], color[..., 1], color[..., 2]))

    def gath(a):
        return a.reshape(P)[tk_idx]

    dep_tk = jnp.where(tk_ok, gath(depth_sb), inf)
    ca_tk, cb_tk = _unpack_f16(gath(payload_words[2]))
    cc_tk, op_tk = _unpack_f16(gath(payload_words[3]))
    r_tk, g_tk, b_tk = _unpack_rgb9e5(gath(payload_words[4]))
    bigs = _build_big_set(
        (gath(ipos_sb[..., 0]), gath(ipos_sb[..., 1]),
         ca_tk, cb_tk, cc_tk, r_tk, g_tk, b_tk, op_tk,
         tk_idx.astype(jnp.uint32)),
        tk_ok, dep_tk,
        residual=(jnp.sum(is_big) - jnp.sum(tk_ok)).astype(jnp.int32),
        gx=gx, gy=gy, ts=ts)

    # --- stage 1: per-superblock (cell Morton, depth16) clustering ----------
    # 7 operands (key + ix/iy f32 + 2 packed f16 pairs + rgb9e5 + idx): the
    # row sort scales with operand traffic (~3 Gkeys/s/operand), so conic
    # and opacity ride as f16 bit-pairs and all three color channels share
    # ONE rgb9e5 word (the projection radius is not needed post-sort at
    # all — coverage extents rebuild from the carried conic/opacity)
    key = jnp.where(valid_sb & ~taken,
                    ((morton & 0x7FFF) << 16) | depth_sb, inf)
    import os as _os
    if _os.environ.get("GS_BLOCKS_GATHER", "0") == "1":
        # perm-sort variant (GS_BLOCKS_GATHER=1, trace-time knob for TPU
        # A/B): sort only (key, source idx) — 2 operands instead of 7 —
        # then apply the permutation with ONE packed take_along_axis.
        # Wins iff the TPU gather of (SB, sb_size, 5) u32 beats dragging
        # 5 payload operands through the row sort's merge network.
        key_s, idx_g = jax.lax.sort((key, idx), dimension=1, num_keys=1,
                                    is_stable=True)
        col = (idx_g - jnp.arange(SB, dtype=jnp.uint32)[:, None]
               * jnp.uint32(sb_size)).astype(jnp.int32)
        packed = jnp.stack(payload_words, axis=-1)   # (SB, sb_size, 5)
        g5 = jnp.take_along_axis(packed, col[..., None], axis=1)
        s1 = (key_s,) + tuple(g5[..., j] for j in range(5)) + (idx_g,)
    elif cfg.cluster == "bricks":
        # STATIC 3D-brick clustering: blocks are consecutive 128-splat runs
        # of the load-time Morton order — no per-frame sort at all. Bricks
        # are compact world-space blobs, so projected rects AND depth
        # ranges stay naturally tight for any camera, and the clustering is
        # fully temporally stable (the per-frame (cell, depth16) re-sort
        # the "screen" mode pays ~8 ms/frame for at the 5.8M headline).
        s1 = (key,) + payload_words + (idx,)
    else:
        s1 = jax.lax.sort((key,) + payload_words + (idx,),
                          dimension=1, num_keys=1, is_stable=True)

    frame = _frame_from_stage1(
        s1, B, S, cfg, jnp.sum(prj.num_tiles).astype(jnp.int32),
        words=words_payload)
    return frame, bigs


def _frame_from_stage1(s1, B: int, S: int, cfg: RasterizerConfig,
                       num_culled_pairs, words: bool = False) -> BlockFrame2:
    """Stage-1-sorted operand rows -> BlockFrame2 (blocks cut from the
    sorted order, MXU power features, rects, bitmaps, depth ranges).

    s1: 7-tuple of sorted u32 arrays (key, ix bits, iy bits, f16(ca|cb),
    f16(cc|op), rgb9e5, source idx), any row shape reshapeable to (B, S).

    words=True: skip the 16-row f32 payload cook — the payload becomes the
    (B, 8, S) u32 WORD image [key, ix, iy, pc1, pc2, rgb9e5, idx,
    rx|ry bf16 pair] and the render kernel unpacks + evaluates features
    in-kernel, per PROCESSED block only (early exit leaves ~7% of binned
    blocks live at the 5.8M/1080p headline, so cooking every block in XLA
    wastes ~14x the feature work plus a 372 MB/frame payload write). Block
    meta (rect, bitmap, depth range, num_valid) is bit-identical across
    modes."""
    gx, gy = cfg.tile_dims
    ts = float(cfg.tile_size)
    inf = jnp.uint32(0xFFFFFFFF)

    def blk(x):  # (SB, sb_size) -> (B, S)
        return x.reshape(B, S)

    def f32b(w):
        return jax.lax.bitcast_convert_type(w, jnp.float32)

    key_b = blk(s1[0])
    depth_b = key_b & 0xFFFF
    ix, iy = f32b(blk(s1[1])), f32b(blk(s1[2]))
    ca, cb = _unpack_f16(blk(s1[3]))
    cc, op = _unpack_f16(blk(s1[4]))
    r, g, b = _unpack_rgb9e5(blk(s1[5]))
    idx_s = blk(s1[6])
    valid = key_b != inf
    # anisotropic coverage extents, derived from the carried conic/opacity
    # (no extra sort operand)
    rx, ry = extents_from_conic(ca, cb, cc, op)

    nv = jnp.sum(valid, axis=1).astype(jnp.int32)
    ix_p = jnp.where(valid, ix, _CULL_FAR)
    iy_p = jnp.where(valid, iy, _CULL_FAR)
    rx_p = jnp.where(valid, rx, 0.0)
    ry_p = jnp.where(valid, ry, 0.0)

    if words:
        u32b = lambda a: jax.lax.bitcast_convert_type(  # noqa: E731
            a, jnp.uint32)
        payload = jnp.stack(
            [blk(s1[0]), blk(s1[1]), blk(s1[2]), blk(s1[3]), blk(s1[4]),
             blk(s1[5]), blk(s1[6]), u32b(_pack_bf16_pair(rx_p, ry_p))],
            axis=1)                                            # (B, 8, S) u32
    else:
        # --- per-block center + MXU power features --------------------------
        nv_safe = jnp.maximum(nv, 1).astype(jnp.float32)
        ix_v = jnp.where(valid, ix, 0.0)
        iy_v = jnp.where(valid, iy, 0.0)
        bcx = jnp.clip(jnp.round(jnp.sum(ix_v, axis=1) / nv_safe),
                       0.0, 16383.0)                           # (B,)
        bcy = jnp.clip(jnp.round(jnp.sum(iy_v, axis=1) / nv_safe),
                       0.0, 16383.0)
        ixr = ix - bcx[:, None]
        iyr = iy - bcy[:, None]

        # ln(opacity), clamped so alpha = exp(power) stays strictly below 1:
        # log1p(-alpha) in the render kernel is then always finite. The 1e-3
        # clamp deviates from the reference by <=0.1% opacity for fully
        # opaque splats (the reference itself has no alpha clamp,
        # gsplat_render.glsl:86).
        ln_op = jnp.minimum(jnp.log(jnp.maximum(op, 1e-37)), -1e-3)

        f0q = -0.5 * (ca * ixr * ixr + cc * iyr * iyr) - cb * ixr * iyr
        f0 = jnp.where(valid, f0q + ln_op, GATE_OFF)
        f1 = jnp.where(valid, ca * ixr + cb * iyr, 0.0)
        f2 = jnp.where(valid, cc * iyr + cb * ixr, 0.0)
        f3 = jnp.where(valid, -0.5 * ca, 0.0)
        f4 = jnp.where(valid, -0.5 * cc, 0.0)
        f5 = jnp.where(valid, -cb, 0.0)

        # row 12: PACKED ORDER RANK (depth16 << 16 | idx >> 7, sign-flipped
        # for signed compare), precomputed here so the render kernel's
        # ordering masks read it with one bitcast instead of rebuilding it
        # per batch. Invalid lanes carry depth16 0xFFFF -> maximal rank
        # (ordering-inert; their mass is zero via f0 = GATE_OFF anyway).
        rank = ((depth_b.astype(jnp.int32) << 16)
                | ((idx_s.astype(jnp.int32) >> 7) & 0xFFFF)) ^ jnp.int32(
                    -0x80000000)
        w12 = jax.lax.bitcast_convert_type(rank, jnp.float32)
        idx_f = jax.lax.bitcast_convert_type(idx_s, jnp.float32)

        # rows 14/15: the feature center, broadcast per lane (the render
        # kernel re-centers features to the tile origin from these,
        # uniformly for chain blocks and per-lane-centered big lanes)
        bcx_l = jnp.broadcast_to(bcx[:, None], (B, S))
        bcy_l = jnp.broadcast_to(bcy[:, None], (B, S))

        payload = jnp.stack([
            f0, f1, f2, f3, f4, f5,
            jnp.where(valid, r, 0.0), jnp.where(valid, g, 0.0),
            jnp.where(valid, b, 0.0),
            ix_p, iy_p, _pack_bf16_pair(rx_p, ry_p), w12, idx_f,
            bcx_l, bcy_l,
        ], axis=1)                                             # (B, 16, S)

    # --- block tile rect / coverage bitmap / depth range --------------------
    gxf, gyf = jnp.float32(gx), jnp.float32(gy)
    srx0 = jnp.clip((ix_p - rx_p) / ts, 0.0, gxf).astype(jnp.int32)
    sry0 = jnp.clip((iy_p - ry_p) / ts, 0.0, gyf).astype(jnp.int32)
    srx1 = jnp.clip(jnp.ceil((ix_p + rx_p) / ts), 0.0, gxf).astype(jnp.int32)
    sry1 = jnp.clip(jnp.ceil((iy_p + ry_p) / ts), 0.0, gyf).astype(jnp.int32)
    bigc = jnp.int32(1 << 20)
    srx0 = jnp.where(valid, srx0, bigc)
    sry0 = jnp.where(valid, sry0, bigc)
    srx1 = jnp.where(valid, srx1, -bigc)
    sry1 = jnp.where(valid, sry1, -bigc)

    lo = jnp.stack([jnp.min(srx0, axis=1), jnp.min(sry0, axis=1)], -1)
    hi = jnp.stack([jnp.max(srx1, axis=1), jnp.max(sry1, axis=1)], -1)
    empty = ~jnp.any(valid, axis=1)
    block_rect = jnp.where(
        empty[:, None],
        jnp.zeros((B, 4), jnp.int32),
        jnp.concatenate([lo, jnp.maximum(hi, lo)], axis=-1).astype(jnp.int32))

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
    bits = jnp.where(valid, bits, 0)
    bitmap = jax.lax.reduce(bits, jnp.uint32(0), jax.lax.bitwise_or, (1,))

    dep_u = jnp.where(valid, depth_b, jnp.uint32(0xFFFF))
    min_depth = jnp.min(jnp.where(valid, dep_u, jnp.uint32(0xFFFF)), axis=1)
    max_depth = jnp.max(jnp.where(valid, dep_u, jnp.uint32(0)), axis=1)
    min_depth = jnp.where(empty, jnp.uint32(0xFFFF), min_depth)
    max_depth = jnp.where(empty, jnp.uint32(0xFFFF), max_depth)

    return BlockFrame2(
        payload=payload,
        rect=block_rect,
        bitmap=bitmap,
        min_depth=min_depth,
        max_depth=max_depth,
        num_valid=nv,
        num_culled_pairs=num_culled_pairs,
    )


def build_block_frame2_words(words, cfg: RasterizerConfig,
                             num_splats: int | None = None,
                             big_cap: int | None = None,
                             words_payload: bool = False):
    """Fused-projection outputs (ops/projection_pallas.ProjWords) ->
    (BlockFrame2, BigSet). Same semantics as build_block_frame2: the
    kernel already performed the Phase-A per-splat packing (f16 conic
    pairs, rgb9e5 color, big-candidate keys, screen-cell Morton) and
    emitted every operand in its consumer's shape, so this runs only the
    sorts, the big selection and the post-sort block build."""
    P = words.key.shape[1]
    S = BLOCK_SIZE
    sb_size = min(SUPERBLOCK, P)
    assert P % sb_size == 0, P
    SB = P // sb_size
    B = P // S
    gx, gy = cfg.tile_dims
    ts = float(cfg.tile_size)
    inf = jnp.uint32(0xFFFFFFFF)

    cnt = words.cnt.reshape(-1, 128)
    num_big = jnp.sum(cnt[:, 0]).astype(jnp.int32)
    nt_total = jnp.sum(cnt[:, 1]).astype(jnp.int32)

    if big_cap is None:
        big_cap = default_big_cap(P)
    big_cap = max(big_cap, S)
    tk_idx, tk_ok = _select_big_lanes(words.bkey, big_cap)
    taken = jnp.zeros((P,), bool).at[tk_idx].set(tk_ok)

    def ugath(a):
        return jax.lax.bitcast_convert_type(
            a.reshape(P), jnp.float32)[tk_idx]

    idx = jnp.arange(P, dtype=jnp.uint32)
    key_flat = words.key.reshape(P)
    dep_tk = jnp.where(tk_ok, key_flat[tk_idx] & 0xFFFF, inf)
    # big lanes unpack from the packed sort words (f16 conic/opacity,
    # rgb9e5 color) — the same precision class the chains carry; this
    # halves the extraction gathers and drops the kernel's former
    # (7, P) f32 big table (162 MB/frame of writes) entirely.
    ca_tk, cb_tk = _unpack_f16(words.pc1.reshape(P)[tk_idx])
    cc_tk, op_tk = _unpack_f16(words.pc2.reshape(P)[tk_idx])
    r_tk, g_tk, b_tk = _unpack_rgb9e5(words.rgb9.reshape(P)[tk_idx])
    bigs = _build_big_set(
        (ugath(words.ix), ugath(words.iy),
         ca_tk, cb_tk, cc_tk, r_tk, g_tk, b_tk, op_tk,
         tk_idx.astype(jnp.uint32)),
        tk_ok, dep_tk,
        residual=num_big - jnp.sum(tk_ok).astype(jnp.int32),
        gx=gx, gy=gy, ts=ts)

    def srows(a):
        return a.reshape(SB, sb_size)

    key = jnp.where(taken.reshape(SB, sb_size), inf, srows(words.key))
    ops = (key, srows(words.ix), srows(words.iy), srows(words.pc1),
           srows(words.pc2), srows(words.rgb9), idx.reshape(SB, sb_size))
    if cfg.cluster == "bricks":   # static Morton bricks: no per-frame sort
        s1 = ops
    else:
        s1 = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=True)
    return _frame_from_stage1(s1, B, S, cfg, nt_total,
                              words=words_payload), bigs
