"""Fused Pallas projection for the fast path: one HBM pass per frame.

The jnp projection (ops/projection.py) + the fast path's stage-1 operand
packing (ops/blocks2.py) are all elementwise over the splat axis, but XLA
schedules them as ~15 separate loop fusions that each re-stream multi-MB
(P,) intermediates — measured ~8.5 ms of the 5.8M/1080p headline frame
against a ~1.6 ms HBM traffic floor. This kernel performs the WHOLE
per-splat pipeline in a single pass:

    frustum cull -> fade-in -> EWA covariance -> eigen radius/rect ->
    SH color -> depth16 -> f16 conic pack + rgb9e5 color pack ->
    big-candidate key + screen-cell Morton code

and writes each downstream operand in its CONSUMER'S shape (a
multi-output pallas_call), so nothing is re-laid-out between the kernel
and the sorts — the earlier single (16, P) word image cost ~4.4 ms/frame
of row-extraction fusions at the 5.8M/1080p headline. Every reference
numeric quirk matches ops/projection.py (same formulas, same clamps —
see that module's gsplat_projection.glsl line map); the packing matches
ops/blocks2.py bit-for-bit (same _pack_f16 / _pack_rgb9e5 helpers traced
into the kernel).

Input layout: the kernel reads splat-minor (k, P) views of the SplatCloud
arrays. XLA already lays (P, 3)/(P, 6) arrays out splat-minor (layouts
{0,1} in the headline HLO), so those transposes at the call boundary are
relabelings; keep SH resident as (48, P) (models/splats.sh_planar) or its
transpose is a real ~2.7 ms/frame data movement.

Outputs (ProjWords namedtuple). Sort operands are (1, P) lane rows — the
superblock reshape outside is a plain retiling copy (~0.06 ms each at the
headline); Pallas TPU cannot write (1, CPK) windows of a (SB, sb_size)
tiled array directly (block shapes must be (8k, 128m) or match the array
dim), and the expensive per-lane extraction work lives in-kernel either
way:
    key   (1, P) u32   (morton15 << 16) | depth16, inf when culled —
                       stage-1 sort key (pre big-lane knockout)
    ix,iy (1, P) u32   f32 pixel-space center bits — sort operands
    pc1   (1, P) u32   f16 bit-pair ca|cb — sort operand
    pc2   (1, P) u32   f16 bit-pair cc|op — sort operand
    rgb9  (1, P) u32   shared-exponent color — sort operand
    bkey  (R, CW) u32  big-candidate chunk key ((depth16<<10)|col), inf
                       for non-candidates — big row-sort rows
    cnt   (1, grid*128) i32  per-chunk partial sums at cols [128i] num_big
                       and [128i+1] covered-tile count (stats parity)

The big-lane extraction (ops/blocks2.build_block_frame2_words) gathers its
~40K taken lanes from the packed pc1/pc2/rgb9 words and unpacks — an
earlier (7, P) full-precision f32 big table cost 162 MB/frame of kernel
writes plus four extra 0.3 ms scalar gathers at the 5.8M headline for a
precision class (f16 conic, rgb9e5 color) the chain path already accepts
for every splat.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RasterizerConfig
from .blocks import BIG_RADIUS
from .blocks2 import _pack_rgb9e5, extents_from_conic
from .sh import SH_C0, SH_C1, SH_C2, SH_C3

class ProjWords(NamedTuple):
    """Fused-projection outputs, each in its consumer's shape (see module
    docstring)."""
    key: jnp.ndarray    # (1, P) u32
    ix: jnp.ndarray     # (1, P) u32 (f32 bits)
    iy: jnp.ndarray     # (1, P) u32 (f32 bits)
    pc1: jnp.ndarray    # (1, P) u32
    pc2: jnp.ndarray    # (1, P) u32
    rgb9: jnp.ndarray   # (1, P) u32
    bkey: jnp.ndarray   # (R, CW) u32
    cnt: jnp.ndarray    # (1, grid*128) i32


def _f16_bits(x):
    """f32 -> IEEE binary16 bit pattern (in a u32), round-to-nearest-even.

    Matches jnp .astype(float16) bit-for-bit on finite inputs, including
    subnormal results (giant splats produce conic coefficients below the
    f16 normal range; flushing them to zero would turn a residual big
    splat into a flat-color rect) and overflow-to-inf. Integer-only:
    Mosaic has no f16 cast on v5e ('tpu.pack_subelements' fails to
    legalize), so the conversion is spelled out in vector int ops."""
    u32 = jnp.uint32
    b = jax.lax.bitcast_convert_type(x, u32)
    s = (b >> 16) & u32(0x8000)
    ab = b & u32(0x7FFFFFFF)
    e = (ab >> 23).astype(jnp.int32)                   # f32 biased exponent
    m = (ab & u32(0x7FFFFF)).astype(jnp.int32)

    # normal f16 (113 <= e <= 142): drop 13 mantissa bits with RNE; the +1
    # carry propagates into the exponent field (and to inf at e16 == 31)
    r = m >> 13
    rem = m & 0x1FFF
    up = jnp.where((rem > 0x1000) | ((rem == 0x1000) & ((r & 1) == 1)), 1, 0)
    h_norm = (((e - 112) << 10) | r) + up

    # subnormal f16 (e <= 112): shift the full significand right by
    # t = 126 - e (>= 14), RNE on the shifted-out bits; rounding up into
    # the smallest normal is automatic (the encoding is continuous)
    M = m | 0x800000
    t = jnp.clip(126 - e, 14, 31)
    rs = M >> t
    half = 1 << (t - 1)
    remv = M & ((1 << t) - 1)
    ups = jnp.where((remv > half) | ((remv == half) & ((rs & 1) == 1)), 1, 0)
    h_sub = rs + ups

    h = jnp.where(e <= 112, h_sub, h_norm)
    h = jnp.where(e >= 143, 0x7C00, h)                 # overflow/inf/nan
    return s | h.astype(u32)


def _pack_f16_kernel(a, b):
    """Kernel-side _pack_f16 (blocks2.py:69): same bit layout, int-only."""
    return _f16_bits(a) | (_f16_bits(b) << 16)


def _chunk(P: int) -> int:
    for c in (8192, 4096, 2048, 1024, 512, 256, 128):
        if P % c == 0:
            return c
    return P


def _proj_kernel(uni_ref, means_ref, cov_ref, op_ref, ut_ref, sh_ref,
                 key_ref, ix_ref, iy_ref, pc1_ref, pc2_ref, rgb9_ref,
                 bkey_ref, cnt_ref, *, CPK, CW, cell, w, h, gx,
                 gy, ts, sh_degree, jq_quirk):
    f32 = jnp.float32
    u32 = jnp.uint32
    i = pl.program_id(0)

    def u(k):
        return uni_ref[k]

    def row(ref, k):
        return ref[k:k + 1, :].astype(f32)

    def bits(x):
        return jax.lax.bitcast_convert_type(x, u32)

    # --- world/view/clip transforms (projection.py:75-79) -------------------
    ms = u(31)
    spx = row(means_ref, 0) * ms
    spy = row(means_ref, 1) * ms
    spz = row(means_ref, 2) * ms
    vpx = u(0) * spx + u(1) * spy + u(2) * spz + u(9)
    vpy = u(3) * spx + u(4) * spy + u(5) * spz + u(10)
    vpz = u(6) * spx + u(7) * spy + u(8) * spz + u(11)
    clx = u(12) * vpx + u(13) * vpy + u(14) * vpz + u(21)
    cly = u(15) * vpx + u(16) * vpy + u(17) * vpz + u(22)
    clz = u(18) * vpx + u(19) * vpy + u(20) * vpz + u(23)
    clw = u(24) * vpx + u(25) * vpy + u(26) * vpz + u(27)

    bound = clw * 1.2
    inside = ((clx >= -bound) & (clx <= bound)
              & (cly >= -bound) & (cly <= bound)
              & (clz >= 0.0) & (clz <= clw))

    # --- load fade-in (projection.py:89-94) ----------------------------------
    st = u(32) - row(ut_ref, 0)

    def ease(x):
        a = 1.0 - x
        return 1.0 - a * a * a

    tf = ease(jnp.clip(st, 0.0, 1.0))
    tfl = ease(jnp.clip(st - 0.35, 0.0, 1.0))
    sop = row(op_ref, 0) * tfl * tfl
    sscale = ms * (2.0 - tfl)

    # --- EWA 2D covariance (projection.py:96-129) ----------------------------
    s2 = sscale * sscale
    xx = row(cov_ref, 0) * s2
    xy = row(cov_ref, 1) * s2
    xz = row(cov_ref, 2) * s2
    yy = row(cov_ref, 3) * s2
    yz = row(cov_ref, 4) * s2
    zz = row(cov_ref, 5) * s2
    # uni 33/34: focal = dims*0.5*(proj00, proj11); 35/36: tan_fov
    z_inv = 1.0 / vpz
    fzx = u(33) * z_inv
    fzy = u(34) * z_inv
    mx = jnp.clip(vpx * z_inv, -u(35) * 1.3, u(35) * 1.3)
    my = jnp.clip(vpy * z_inv, -u(36) * 1.3, u(36) * 1.3)
    jq = fzy if jq_quirk else fzx
    # b0 = Rv^T col combos, expanded per component (projection.py:110-113)
    njm = -jq * mx
    nfm = -fzy * my
    b0x = u(0) * fzx + u(6) * njm
    b0y = u(1) * fzx + u(7) * njm
    b0z = u(2) * fzx + u(8) * njm
    b1x = u(3) * fzy + u(6) * nfm
    b1y = u(4) * fzy + u(7) * nfm
    b1z = u(5) * fzy + u(8) * nfm
    s0x = xx * b0x + xy * b0y + xz * b0z
    s0y = xy * b0x + yy * b0y + yz * b0z
    s0z = xz * b0x + yz * b0y + zz * b0z
    cov_a = b0x * s0x + b0y * s0y + b0z * s0z + 0.3
    cov_b = b1x * s0x + b1y * s0y + b1z * s0z
    s1x = xx * b1x + xy * b1y + xz * b1z
    s1y = xy * b1x + yy * b1y + yz * b1z
    s1z = xz * b1x + yz * b1y + zz * b1z
    cov_c = b1x * s1x + b1y * s1y + b1z * s1z + 0.3

    det = cov_a * cov_c - cov_b * cov_b
    nonsingular = det != 0.0
    mid = 0.5 * (cov_a + cov_c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam1 = mid + disc
    lam2 = mid - disc
    eig_ok = (lam1 >= 0.0) & (lam2 >= 0.0)

    # --- image position with slide-in (projection.py:140-144) ----------------
    # direct divides (not reciprocal-multiply): keeps depth16 quantization
    # and cell assignment boundary-identical with ops/projection.py
    safe_w = jnp.where(clw == 0.0, 1.0, clw)
    ndcx = clx / safe_w
    ndcy = cly / safe_w
    ndcz = clz / safe_w
    ix = ((ndcx + 1.0) * 0.5 - (1.0 - tf)) * (w - 1.0)
    iy = ((ndcy + 1.0) * 0.5 - 0.75 * (1.0 - tf)) * (h - 1.0)

    # --- radius / square tile rect / nt (projection.py:146-157) --------------
    radius = (jnp.exp(0.2 * jnp.log(jnp.maximum(sop, 1e-37))) * 2.5
              * jnp.sqrt(jnp.maximum(lam1, lam2)))
    radius = jnp.where(sop > 0.0, radius, 0.0)
    gxf, gyf = float(gx), float(gy)
    lox = jnp.clip((ix - radius) / ts, 0.0, gxf).astype(jnp.int32)
    loy = jnp.clip((iy - radius) / ts, 0.0, gyf).astype(jnp.int32)
    hix = jnp.clip(jnp.ceil((ix + radius) / ts), 0.0, gxf).astype(jnp.int32)
    hiy = jnp.clip(jnp.ceil((iy + radius) / ts), 0.0, gyf).astype(jnp.int32)
    nt = (jnp.maximum(hix - lox, 0) * jnp.maximum(hiy - loy, 0))
    valid = inside & nonsingular & eig_ok & (nt > 0)
    nt = jnp.where(valid, nt, 0)

    # --- depth16 (projection.py:159-167) --------------------------------------
    z3 = ndcz * ndcz * ndcz
    d_i = jnp.clip((z3 * f32(0xFFFF)), 0.0, f32(0xFFFE)).astype(jnp.int32)
    depth16 = d_i.astype(u32)

    # --- SH color (ops/sh.py traced formulas) ---------------------------------
    dx = spx - u(28)
    dy = spy - u(29)
    dz = spz - u(30)
    inv_n = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-24))
    x = dx * inv_n
    y = dy * inv_n
    z = dz * inv_n

    def co(k, c):
        return sh_ref[3 * k + c:3 * k + c + 1, :].astype(f32)

    def band(c):
        v = 0.5 + co(0, c) * SH_C0
        if sh_degree >= 1:
            v = (v - co(1, c) * (SH_C1 * y) + co(2, c) * (SH_C1 * z)
                 - co(3, c) * (SH_C1 * x))
        if sh_degree >= 2:
            xx2, yy2, zz2 = x * x, y * y, z * z
            v = (v + co(4, c) * (SH_C2[0] * (x * y))
                 - co(5, c) * (SH_C2[1] * (y * z))
                 + co(6, c) * (SH_C2[2] * (2.0 * zz2 - xx2 - yy2))
                 - co(7, c) * (SH_C2[3] * (x * z))
                 + co(8, c) * (SH_C2[4] * (xx2 - yy2)))
        if sh_degree >= 3:
            xx2, yy2, zz2 = x * x, y * y, z * z
            v = (v - co(9, c) * (SH_C3[0] * y * (3.0 * xx2 - yy2))
                 + co(10, c) * (SH_C3[1] * x * (y * z))
                 - co(11, c) * (SH_C3[2] * y * (4.0 * zz2 - xx2 - yy2))
                 + co(12, c) * (SH_C3[3] * z * (2.0 * zz2 - 3.0 * xx2
                                                - 3.0 * yy2))
                 - co(13, c) * (SH_C3[4] * x * (4.0 * zz2 - xx2 - yy2))
                 + co(14, c) * (SH_C3[5] * z * (xx2 - yy2))
                 - co(15, c) * (SH_C3[6] * x * (xx2 - 3.0 * yy2)))
        return jnp.maximum(v, 0.0)

    r, g, b = band(0), band(1), band(2)

    # --- conic (projection.py:175-177) ----------------------------------------
    safe_det = jnp.where(det == 0.0, 1.0, det)
    det_inv = 1.0 / safe_det
    ca = cov_c * det_inv
    cb = -cov_b * det_inv
    cc = cov_a * det_inv

    # --- fast-path packing (blocks2.py stage-1 operands) ----------------------
    pc1 = _pack_f16_kernel(ca, cb)
    pc2 = _pack_f16_kernel(cc, sop)
    rgb9 = _pack_rgb9e5(r, g, b)

    # big-candidate chunk key: col = lane index within its CW-wide chunk
    rx, ry = extents_from_conic(ca, cb, cc, sop)
    is_big = (jnp.maximum(rx, ry) >= BIG_RADIUS) & valid
    lane = (jax.lax.broadcasted_iota(u32, (1, CPK), 1)
            + u32(CPK) * i.astype(u32))
    col = (lane & u32(CW - 1)) if CW & (CW - 1) == 0 else (
        jax.lax.rem(lane, u32(CW)))
    inf = u32(0xFFFFFFFF)
    bkey = jnp.where(is_big, (depth16 << 10) | col, inf)

    # screen-cell Morton (blocks2.py:301-313)
    ctx = (jnp.clip((ix / ts).astype(jnp.int32), 0, gx - 1).astype(u32)
           >> cell)
    cty = (jnp.clip((iy / ts).astype(jnp.int32), 0, gy - 1).astype(u32)
           >> cell)

    def spread8(v):
        v = (v | (v << 4)) & u32(0x0F0F)
        v = (v | (v << 2)) & u32(0x3333)
        v = (v | (v << 1)) & u32(0x5555)
        return v

    morton = (spread8(ctx & 0xFF) | (spread8(cty & 0xFF) << 1)) & u32(0x7FFF)

    key_ref[...] = jnp.where(valid, (morton << 16) | depth16,
                             inf).reshape(key_ref.shape)
    ix_ref[...] = bits(ix).reshape(ix_ref.shape)
    iy_ref[...] = bits(iy).reshape(iy_ref.shape)
    pc1_ref[...] = pc1.reshape(pc1_ref.shape)
    pc2_ref[...] = pc2.reshape(pc2_ref.shape)
    rgb9_ref[...] = rgb9.reshape(rgb9_ref.shape)
    bkey_ref[...] = bkey.reshape(bkey_ref.shape)
    c128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    nbig_c = jnp.sum(jnp.where(is_big, 1, 0))
    nt_c = jnp.sum(nt)
    cnt_ref[...] = jnp.where(c128 == 0, nbig_c,
                             jnp.where(c128 == 1, nt_c, 0))


def project_words(
    means: jnp.ndarray,        # (P, 3)
    cov3d: jnp.ndarray,        # (P, 6)
    opacity: jnp.ndarray,      # (P,)
    sh: jnp.ndarray,           # (P, 16, 3) f32 or bf16
    upload_time: jnp.ndarray,  # (P,)
    view: jnp.ndarray,         # (4, 4)
    proj: jnp.ndarray,         # (4, 4)
    camera_pos: jnp.ndarray,   # (3,)
    model_scale: jnp.ndarray,
    time: jnp.ndarray,
    cfg: RasterizerConfig,
    num_splats: int | None = None,
    interpret: bool = False,
) -> ProjWords:
    """One fused projection pass -> ProjWords (see module docstring)."""
    P = means.shape[0]
    w, h = cfg.target_size
    gx, gy = cfg.tile_dims
    CPK = _chunk(P)
    from .blocks2 import (SUPERBLOCK, _big_chunk_width,  # cycle-free import
                          adaptive_cell_shift)
    sb_size = min(SUPERBLOCK, P)
    assert P % sb_size == 0, P
    SB = P // sb_size
    CW = _big_chunk_width(P, sb_size)
    cell = adaptive_cell_shift(num_splats or P, gx, gy)
    if jax.default_backend() == "cpu":
        interpret = True

    dims = jnp.array([w, h], jnp.float32)
    tan_fov_inv = jnp.stack([proj[0, 0], proj[1, 1]])
    focal = dims * 0.5 * tan_fov_inv
    uni = jnp.concatenate([
        view[:3, :3].reshape(-1),               # 0-8   Rv row-major
        view[:3, 3],                            # 9-11
        proj[:3, :3].reshape(-1),               # 12-20
        proj[:3, 3],                            # 21-23
        proj[3, :3],                            # 24-26
        proj[3, 3][None],                       # 27
        camera_pos.reshape(3),                  # 28-30
        jnp.asarray(model_scale, jnp.float32)[None],  # 31
        jnp.asarray(time, jnp.float32)[None],         # 32
        focal,                                  # 33-34
        1.0 / tan_fov_inv,                      # 35-36
    ]).astype(jnp.float32)

    kern = functools.partial(
        _proj_kernel, CPK=CPK, CW=CW, cell=cell, w=float(w), h=float(h),
        gx=gx, gy=gy, ts=float(cfg.tile_size), sh_degree=cfg.sh_degree,
        jq_quirk=bool(cfg.reference_jacobian_quirk))

    # splat-minor views: XLA stores the (P, k) SoA arrays splat-minor
    # already, so these transposes are layout relabelings at the custom-call
    # boundary. SH comes pre-planarized (models/splats.sh_planar) — its
    # transpose here would be a real ~560 MB data movement per frame.
    meansT = means.T                                        # (3, P)
    covT = cov3d.T                                          # (6, P)
    opT = opacity.reshape(1, P)
    utT = upload_time.reshape(1, P)
    shT = sh if sh.ndim == 2 else sh.transpose(1, 2, 0).reshape(48, P)

    grid = P // CPK
    u32 = jnp.uint32

    def srow_spec():
        return pl.BlockSpec((1, CPK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    assert CPK % CW == 0, (CPK, CW)
    outs = [
        jax.ShapeDtypeStruct((1, P), u32),                  # key
        jax.ShapeDtypeStruct((1, P), u32),                  # ix
        jax.ShapeDtypeStruct((1, P), u32),                  # iy
        jax.ShapeDtypeStruct((1, P), u32),                  # pc1
        jax.ShapeDtypeStruct((1, P), u32),                  # pc2
        jax.ShapeDtypeStruct((1, P), u32),                  # rgb9
        jax.ShapeDtypeStruct((P // CW, CW), u32),           # bkey
        jax.ShapeDtypeStruct((1, grid * 128), jnp.int32),   # cnt
    ]
    out_specs = [
        srow_spec(), srow_spec(), srow_spec(), srow_spec(), srow_spec(),
        srow_spec(),
        pl.BlockSpec((CPK // CW, CW), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    res = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, CPK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, CPK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CPK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CPK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((48, CPK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(uni, meansT, covT, opT, utT, shT)
    return ProjWords(*res)
