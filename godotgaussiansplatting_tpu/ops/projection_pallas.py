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

and writes one (16, P) word image (`ProjWords`) holding exactly the
operands the block stage consumes. Every reference numeric quirk matches
ops/projection.py (same formulas, same clamps — see that module's
gsplat_projection.glsl line map); the packing matches ops/blocks2.py
bit-for-bit (same _pack_f16 / _pack_rgb9e5 helpers traced into the
kernel).

Input layout: the kernel reads splat-minor (k, P) views of the SplatCloud
arrays. XLA already lays (P, 3)/(P, 6)/(P, 16, 3) arrays out splat-minor
(layouts {0,1} / {0,2,1} in the headline HLO), so the transposes at the
call boundary are relabelings, not data movement.

Word rows (all stored as f32; u32 rows are bitcasts):
    0 ix   1 iy            f32 pixel-space center
    2 ca   3 cb   4 cc     f32 conic (full precision, big-lane tables)
    5 r    6 g    7 b      f32 SH color
    8 op                   f32 final (fade-scaled) opacity
    9 pc1  10 pc2          u32 f16 bit-pairs (ca|cb, cc|op) — stage-1 sort
    11 rgb9e5              u32 shared-exponent color — stage-1 sort
    12 depth16             u32 quantized depth (<= 0xFFFE)
    13 bkey                u32 big-candidate chunk key ((depth16<<8)|col)
    14 flags               u32 bit0 valid, bit1 is_big, bits 2.. morton15
    15 nt                  i32 covered-tile count (stats parity)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RasterizerConfig
from .blocks import BIG_RADIUS
from .blocks2 import _pack_rgb9e5, extents_from_conic
from .sh import SH_C0, SH_C1, SH_C2, SH_C3

PROJ_WORDS = 16


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
                 out_ref, *, CPK, CW, cell, w, h, gx, gy, ts, sh_degree,
                 jq_quirk):
    f32 = jnp.float32
    u32 = jnp.uint32
    i = pl.program_id(0)

    def u(k):
        return uni_ref[k]

    def row(ref, k):
        return ref[k:k + 1, :].astype(f32)

    def bits(x):
        return jax.lax.bitcast_convert_type(x, u32)

    def fbits(x):
        return jax.lax.bitcast_convert_type(x, f32)

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
    one, zero = u32(1), u32(0)
    flags = (jnp.where(valid, one, zero)
             | (jnp.where(is_big, one, zero) << 1) | (morton << 2))

    out_ref[0:1, :] = ix
    out_ref[1:2, :] = iy
    out_ref[2:3, :] = ca
    out_ref[3:4, :] = cb
    out_ref[4:5, :] = cc
    out_ref[5:6, :] = r
    out_ref[6:7, :] = g
    out_ref[7:8, :] = b
    out_ref[8:9, :] = sop
    out_ref[9:10, :] = fbits(pc1)
    out_ref[10:11, :] = fbits(pc2)
    out_ref[11:12, :] = fbits(rgb9)
    out_ref[12:13, :] = fbits(depth16)
    out_ref[13:14, :] = fbits(bkey)
    out_ref[14:15, :] = fbits(flags)
    out_ref[15:16, :] = fbits(nt.astype(jnp.int32))


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
) -> jnp.ndarray:
    """One fused projection pass -> (PROJ_WORDS, P) f32 word image."""
    P = means.shape[0]
    w, h = cfg.target_size
    gx, gy = cfg.tile_dims
    CPK = _chunk(P)
    from .blocks2 import (SUPERBLOCK, _big_chunk_width,  # cycle-free import
                          adaptive_cell_shift)
    CW = _big_chunk_width(P, min(SUPERBLOCK, P))
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

    # splat-minor views: XLA stores the SoA arrays splat-minor already, so
    # these transposes are layout relabelings at the custom-call boundary
    meansT = means.T                                        # (3, P)
    covT = cov3d.T                                          # (6, P)
    opT = opacity.reshape(1, P)
    utT = upload_time.reshape(1, P)
    shT = sh.transpose(1, 2, 0).reshape(48, P)              # (48, P)

    grid = P // CPK
    return pl.pallas_call(
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
        out_specs=pl.BlockSpec((PROJ_WORDS, CPK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((PROJ_WORDS, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(uni, meansT, covT, opT, utT, shT)
