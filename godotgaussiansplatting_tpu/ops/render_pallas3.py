"""Pallas TPU render kernel v3: batch-exact compositing + resident big lanes.
(The grid is parameterized over GROUPs of horizontally contiguous tiles;
GROUP=1 — one tile per grid step — measured fastest, see ops/bigbin.py.)

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

BIG-SPLAT lanes (radius >= BIG_RADIUS) are RESIDENT per tile GROUP
(ops/bigbin.py: one exactly depth-sorted lane list per GROUP-tile window):
their mutual order is exact by construction (one in-VMEM prefix matmul over
all G*NPX group pixels), their screen-space log-alpha maps are precomputed
by ONE batched XLA prepass (prepass_big_la) and streamed through a DMA
ring, and chain<->big occlusion is exchanged per chain batch — each
(chain block, big lane) pair interacts in exactly one direction, so energy
is conserved. Early exit measured only ~8% of binned blocks actually
processed at the headline, which made PER-TILE FIXED COSTS the frame
floor; the chain stream therefore reads its first slab_u batches from an
XLA-pre-gathered contiguous slab (Pallas-auto-pipelined, no in-kernel DMA
machinery) and only deeper tiles touch the per-block DMA ring.

All in-window ordering follows a packed 32-bit rank (depth16 << 16 |
source idx >> 7): one vector compare per mask, matching the exact
pipeline's (depth16, emission order) tie semantics at 128-splat idx
granularity (its stable pair sort breaks ties by source index; the
reference's GPU sort races instead, SURVEY.md §2.1 — equal ranks get no
mutual occlusion, which is energy-conserving and inside that envelope).
Residual deviation vs a full global sort: chain blocks >= 2 batches apart
with overlapping depth ranges, and per-group big lists truncated at OBIG
(closest-first; counted upstream).
The per-pixel early-out (gsplat_render.glsl:79) is applied at batch
granularity per tile and accounts for resident big mass in front of the
stream position.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RasterizerConfig
from .bigbin import GROUP
from .blocks2 import BLOCK_SIZE, DEPTH_INVALID, GATE_OFF, PAYLOAD_WIDTH

OUT_CH = 8         # output channels per pixel: r, g, b, 1, t_final, diag...
BATCH_LANES = 512  # lanes per chain batch at tile_size 16 (U = BATCH_LANES /
                   # BLOCK_SIZE blocks; default_batch_u scales U down as the
                   # pixel count grows so pend_* stays inside VMEM)
LOG_MIN_ALPHA = -5.54126354515843  # ln(1/255)
ALPHA_MAX = 0.99994

# --- software transcendentals (regression-test reference only) --------------
# Round-3 history: these bit-assembly polynomials (<= 1.4e-4 relative error)
# replaced the builtins under lowp on the theory that exp/log1p lowered to
# ~30 vector ops each. Round 5 measured the opposite on real v5e hardware
# (benchmarks/vpu_probe.py): Mosaic lowers jnp.exp/jnp.log1p to the VPU's
# hardware transcendental path at ~2.5x the polynomial rate (builtin eval
# chain 55 G/s vs 22 G/s), at equal or better accuracy (device A/B PSNR
# identical). The kernels now use the builtins on every path; fexp /
# fln_one_minus remain as the XLA-simplifier regression-test subjects
# (tests/test_fast_pipeline.py) and a CPU-interpret reference.
_EXP2_C = (0.999951339, 0.693253055, 0.242256982, 0.055029266)
_LN_C = (0.999999237, -0.499462338, 0.332939744, -0.272216532, 0.218373675)
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def fexp(x):
    """exp(x), ~1.4e-4 relative error, monotone-safe clamps.

    Clamped to [-87, 80]: GATE_OFF lanes (-1e4) land at exp(-87) ~= 1.6e-38
    instead of 0.0 — harmless everywhere this is used (mass terms are
    multiplied by <= 512 color values; log1p(-1.6e-38) is exactly 0).

    Integer/fraction split uses jnp.round (one VPU round-nearest-even op) —
    NOT the classic add-1.5*2^23 magic-constant trick, which XLA's algebraic
    simplifier cancels under jit ((y + C) - C -> y), silently zeroing the
    fraction (regression-tested in tests/test_fast_pipeline.py)."""
    f32, i32 = jnp.float32, jnp.int32
    y = jnp.clip(x, -87.0, 80.0) * _LOG2E
    yn = jnp.round(y)
    f = y - yn
    c0, c1, c2, c3 = _EXP2_C
    p = c0 + f * (c1 + f * (c2 + f * c3))
    n = yn.astype(i32)
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(p, i32) + (n << 23), f32)


def fln_one_minus(alpha):
    """log1p(-alpha) for alpha in [0, ALPHA_MAX], ~1.1e-4 relative error.

    u = 1 - alpha >= 6e-5 stays normal; exponent/mantissa split + a degree-5
    log poly on m in [2/3, 4/3). Exact 0 at alpha == 0 (gated lanes)."""
    f32, i32 = jnp.float32, jnp.int32
    u = 1.0 - alpha
    bits = jax.lax.bitcast_convert_type(u, i32)
    e = (bits >> 23) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & 0x7FFFFF) | jnp.int32(0x3F800000), f32)
    adj = m > (4.0 / 3.0)
    m = jnp.where(adj, m * 0.5, m)
    e = (e + adj.astype(i32)).astype(f32)
    t = m - 1.0
    b0, b1, b2, b3, b4 = _LN_C
    p = t * (b0 + t * (b1 + t * (b2 + t * (b3 + t * b4))))
    return e * _LN2 + p


def default_batch_u(tile_size: int) -> int:
    """Blocks per chain batch: 4 at tile 16; scaled down with pixel count
    (pend_z/pend_la are (2, NPX, U*S) — U=4 at NPX=1024 would be ~6 MB)."""
    return max(1, (BATCH_LANES // BLOCK_SIZE) // max(1, (tile_size // 16) ** 2))


def _f16_word_to_f32(h):
    """IEEE binary16 bits (u32, low 16) -> exact f32 value.

    Inverse of projection_pallas._f16_bits, integer-only (Mosaic has no f16
    cast on v5e): significand as an exact small int -> f32 convert, times a
    bit-built power-of-two scale — both exact, so the product is the f16
    value bit-for-bit as jnp's float16->float32 cast gives it (finite
    inputs; conic/opacity packing never produces inf/nan — blocks2._pack_f16
    range note)."""
    i32, u32, f32 = jnp.int32, jnp.uint32, jnp.float32
    e = ((h >> 10) & 0x1F).astype(i32)
    m = (h & 0x3FF).astype(i32)
    sig = jnp.where(e > 0, m | 0x400, m).astype(f32)     # [0, 2047] exact
    sexp = jnp.where(e > 0, e - 25, -24) + 127           # 2^(e-25) / 2^-24
    scale = jax.lax.bitcast_convert_type(sexp << 23, f32)
    mag = sig * scale
    bits = jax.lax.bitcast_convert_type(mag, u32) | ((h & u32(0x8000)) << 16)
    return jax.lax.bitcast_convert_type(bits, f32)


def _rgb9e5_word_to_f32(w):
    """rgb9e5 u32 -> (r, g, b) f32, matching blocks2._unpack_rgb9e5 exactly
    (the exp2 there is a power of two; built here with integer bit ops)."""
    i32, f32 = jnp.int32, jnp.float32
    e = ((w >> 27) & 0x1F).astype(i32) - 15
    scale = jax.lax.bitcast_convert_type((e - 9 + 127) << 23, f32)

    def d(sh):
        return ((w >> sh) & 0x1FF).astype(i32).astype(f32) * scale

    return d(0), d(9), d(18)


def _render_kernel_v3(
    rows_hbm,        # (TG, G*8, 128) i32 ANY — packed per-group tile rows
    payload_hbm,     # (B, PW, S) f32 ANY — per-block chain payload
    bigpay_hbm,      # (TG, PW, OBIG) f32 ANY — per-group big-lane payload
    bigla_hbm,       # (TG, G*NPX, OBIG) cdt ANY — per-group big-lane
                     # log1p(-alpha) maps, precomputed by prepass_big_la
                     # (the per-tile eval+power+exp ran for ~98% of tiles
                     # as ~35 small overhead-bound ops; batched in XLA it
                     # is throughput-bound)
    slab_ref,        # (1, PW, slab_u*US) f32 VMEM — XLA-pre-gathered first
                     # slab_u chain batches of this tile (auto-pipelined;
                     # dummy (1, PW, S) zeros when slab_u == 0)
    pixf_b_ref,      # (NPX, 8) bf16 VMEM — tile-local pixel features (hi)
    pixf_lo_ref,     # (NPX, 8) bf16 VMEM — lo half (zeros at tile<=16)
    lt_ob_ref,       # (OBIG, OBIG) cdt VMEM — strict lower-triangle mask
    out_ref,         # (1, G*NPX, OUT_CH) f32
    row_smem,        # SMEM (2, G*8, 128) i32
    meta,            # SMEM (6,) i32 — [prev_bmin, prev_bmax, big_bucket_mask
                     # lo, hi (32 x 2048-depth buckets), exit_flag]
    pay_vmem,        # VMEM (2, PW, U*S) f32 — chain batch ring (each block
                     # DMAs into its lane offset; the batch is one slab)
    big_vmem,        # VMEM (2, PW, OBIG) f32 — big payload ring
    bigla_vmem,      # VMEM (2, G*NPX, OBIG) cdt — big la-map ring (read
                     # in place; never copied to a scratch)
    pend_z,          # VMEM (2, NPX, US) f32
    pend_c,          # VMEM (2, NPX, 1) f32 — per-pixel z column (carry +
                     # uniform big front mass), added at emit time
    pend_la,         # VMEM (2, NPX, US) cdt
    pend_al,         # VMEM (2, NPX, US) bf16 — batch alphas (emit's single
                     # exp; bf16 alpha is at least as accurate as bf16 la)
    pend_rgb,        # VMEM (2, 4, US) bf16
    pend_w,          # VMEM (2, 1, US) i32 — packed order rank
    big_z,           # VMEM (G*NPX, OBIG) f32
    big_rgb,         # VMEM (4, OBIG) bf16
    big_d,           # VMEM (1, OBIG) f32
    big_w,           # VMEM (1, OBIG) i32 — packed order rank
    cols_v,          # VMEM (G*NPX, 8) f32 — per-pixel column state: [acc
                     # r,g,b,-, tcar, texit, big_tot, diag] (separate (NPX,1)
                     # scratches each pad to 128 lanes)
    row_sems,        # DMA sems (2,)
    sems,            # DMA sems (2, U)
    big_sems,        # DMA sems (2,)
    bigla_sems,      # DMA sems (2,)
    *, gx2: int, tile_size: int, num_groups: int, early_exit: bool,
    lowp: bool, max_batches: int, obig: int, U: int, slab_u: int = 0,
    ablate: str = "", words: bool = False,
):
    S = BLOCK_SIZE
    US = U * S
    G = GROUP
    NPX = tile_size * tile_size
    NPXG = G * NPX
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    cdt = bf16 if lowp else f32
    t = pl.program_id(0)
    slot_r = jax.lax.rem(t, 2)

    def srow(pos, base, slot, g):
        k = pos + base * 128
        return row_smem[slot, g * 8 + k // 128, jax.lax.rem(k, 128)]

    def block_id(pos, slot, g):
        return srow(pos, 1, slot, g) & 0x7FFFFF

    def start_batch0(slot, g):
        """Start batch-0 chain DMAs for tile g of the group whose rows sit
        in row_smem[slot] (into ring slot 0 / sems[0, u]). Only used when
        no slab is configured — with a slab the first slab_u batches never
        touch the ring (a stray prefetch here would leak its semaphore)."""
        if "noloop" in ablate or slab_u > 0:
            return
        nb_s = row_smem[slot, g * 8, 0]
        for u in range(U):
            @pl.when(u < nb_s)
            def _(u=u):
                pltpu.make_async_copy(
                    payload_hbm.at[block_id(u, slot, g)],
                    pay_vmem.at[0, :, pl.ds(u * S, S)],
                    sems.at[0, u]).start()

    # --- group-row + big-payload double buffering ---------------------------
    # Invariant at the top of group t>0: row_smem[slot_r] was already WAITED
    # at the END of group t-1, and tile 0's batch-0 chain DMAs are already
    # in flight (started from group t-1's tail) — batch-0 DMA latency is
    # hidden behind the previous group's drain + this group's big pre-pass.
    @pl.when(t == 0)
    def _():
        # zero the chain ring once: lanes beyond a tile's nb are read by the
        # batch matmuls before any DMA ever wrote them (gated to zero mass,
        # but uninitialized VMEM can hold NaN/Inf bit patterns that defeat
        # the additive gate). Later tiles overwrite with bounded payloads.
        pay_vmem[...] = jnp.zeros(pay_vmem.shape, pay_vmem.dtype)
        pltpu.make_async_copy(rows_hbm.at[0], row_smem.at[0],
                              row_sems.at[0]).start()
        if "nobigdma" not in ablate:
            pltpu.make_async_copy(bigpay_hbm.at[0], big_vmem.at[0],
                                  big_sems.at[0]).start()
            pltpu.make_async_copy(bigla_hbm.at[0], bigla_vmem.at[0],
                                  bigla_sems.at[0]).start()
        pltpu.make_async_copy(rows_hbm.at[0], row_smem.at[0],
                              row_sems.at[0]).wait()
        start_batch0(0, 0)
    if "nobigdma" not in ablate:
        pltpu.make_async_copy(bigpay_hbm.at[0], big_vmem.at[slot_r],
                              big_sems.at[slot_r]).wait()
        pltpu.make_async_copy(bigla_hbm.at[0], bigla_vmem.at[slot_r],
                              bigla_sems.at[slot_r]).wait()
    @pl.when(t + 1 < num_groups)
    def _():
        pltpu.make_async_copy(rows_hbm.at[t + 1], row_smem.at[1 - slot_r],
                              row_sems.at[1 - slot_r]).start()
        if "nobigdma" not in ablate:
            pltpu.make_async_copy(bigpay_hbm.at[t + 1],
                                  big_vmem.at[1 - slot_r],
                                  big_sems.at[1 - slot_r]).start()
            pltpu.make_async_copy(bigla_hbm.at[t + 1],
                                  bigla_vmem.at[1 - slot_r],
                                  bigla_sems.at[1 - slot_r]).start()

    cand0 = row_smem[slot_r, 0, 1]  # noqa: F841 (per-tile cand read below)
    hm_f = row_smem[slot_r, 0, 2].astype(f32) * (1.0 / 65536.0)
    y_off = row_smem[slot_r, 0, 3]
    nbig = row_smem[slot_r, 0, 4]
    if "bigpre" in ablate or "nobigdma" in ablate:
        nbig = nbig * 0      # ablation: no resident big lanes at all
    has_big = nbig > 0

    def block_mm(pos, g):
        w = srow(pos, 3, slot_r, g)
        return (w >> 16) & 0xFFFF, w & 0xFFFF

    # --- shared pixel geometry ----------------------------------------------
    group_x = (jax.lax.rem(t, gx2) * (G * tile_size)).astype(f32)
    group_y = ((t // gx2) * tile_size + y_off).astype(f32)
    tsz = float(tile_size)

    def eval_payload(pay, live, ox, oy, span_x, span_y):
        """(PW, W) CHAIN payload -> (F (8,W) re-centered to (ox, oy),
        rgbT (3,W), w (1,W) packed order rank).

        live: scalar or (1, W) mask ANDed into the coverage gate; lanes
        failing it get alpha=0 via the gate row (their other feature rows
        need no masking: stale ring lanes hold BOUNDED real payloads from
        earlier blocks and in-block invalid lanes are sanitized upstream,
        so the single gate row kills their mass). The coverage gate tests
        the lane's anisotropic rect against the
        [ox, ox+span_x) x [oy, oy+span_y) pixel window.

        Chain payloads carry the precomputed order rank in row 12
        (ops/blocks2.py) — one bitcast here. The rank: depth16 in the high
        16 bits, source idx (at 128-splat granularity) in the low 16,
        sign-bit-XORed so unsigned order maps onto the VPU's signed i32
        compare — every ordering mask below is ONE vector compare instead
        of a (depth, idx) lexicographic chain. Ties get no mutual
        occlusion — energy-conserving, inside the exact pipeline's idx
        tie-break envelope (ops/sort.py stable sort). (Big lane tables
        keep plain depth16-as-f32 in row 12; their eval runs batched in
        prepass_big_la and their rank is built in the thin pre-pass.)"""
        if words:
            # (8, W) u32 word payload: unpack + evaluate features IN-KERNEL
            # directly at the tile origin (early exit leaves ~7% of binned
            # blocks live — cooking every block in XLA wasted ~14x the
            # feature work plus a 372 MB/frame payload write). All ops here
            # are (1, W) rows — trivial next to the (NPX, W) power matmul.
            key_w = pay[0:1, :]
            val_w = key_w != jnp.uint32(0xFFFFFFFF)
            ca = jnp.where(val_w, _f16_word_to_f32(pay[3:4, :] & 0xFFFF), 0.)
            cb = jnp.where(val_w, _f16_word_to_f32(pay[3:4, :] >> 16), 0.0)
            cc = jnp.where(val_w, _f16_word_to_f32(pay[4:5, :] & 0xFFFF), 0.)
            op = jnp.where(val_w, _f16_word_to_f32(pay[4:5, :] >> 16), 1e-6)
            ln_op = jnp.minimum(jnp.log(jnp.maximum(op, 1e-37)), -1e-3)
            ixl = jax.lax.bitcast_convert_type(pay[1:2, :], f32) - ox
            iyl = jax.lax.bitcast_convert_type(pay[2:3, :], f32) - oy
            f3 = -0.5 * ca
            f4 = -0.5 * cc
            f5 = -cb
            f1u = ca * ixl + cb * iyl
            f2u = cc * iyl + cb * ixl
            f0u = jnp.where(
                val_w,
                (-0.5 * (ca * ixl * ixl + cc * iyl * iyl)
                 - cb * ixl * iyl) + ln_op,
                GATE_OFF)
            rxy = pay[7:8, :]
            rxw = jax.lax.bitcast_convert_type(
                (rxy & 0xFFFF).astype(jnp.uint16), bf16).astype(f32)
            ryw = jax.lax.bitcast_convert_type(
                (rxy >> 16).astype(jnp.uint16), bf16).astype(f32)
            covered = ((ixl - rxw < span_x) & (ixl + rxw > 0.0)
                       & (iyl - ryw < span_y) & (iyl + ryw > 0.0))
            gate = jnp.where(covered & live & val_w, 0.0, GATE_OFF)
            z1 = jnp.zeros((1, pay.shape[1]), f32)
            F = jnp.concatenate([f0u, f1u, f2u, f3, f4, f5, gate, z1],
                                axis=0)                         # (8, W)
            r, g, b = _rgb9e5_word_to_f32(
                jnp.where(val_w, pay[5:6, :], 0))
            rgbT = jnp.concatenate([r, g, b], axis=0).astype(bf16)
            rank = (((key_w & 0xFFFF).astype(jnp.int32) << 16)
                    | ((pay[6:7, :].astype(jnp.int32) >> 7) & 0xFFFF)
                    ) ^ jnp.int32(-0x80000000)
            return F, rgbT, rank
        f0, f1, f2 = pay[0:1, :], pay[1:2, :], pay[2:3, :]
        f3, f4, f5 = pay[3:4, :], pay[4:5, :], pay[5:6, :]
        dx = ox - pay[14:15, :]
        dy = oy - pay[15:16, :]
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
        covered = ((ixr - rxw < ox + span_x) & (ixr + rxw > ox)
                   & (iyr - ryw < oy + span_y) & (iyr + ryw > oy))
        gate = jnp.where(covered & live, 0.0, GATE_OFF)
        z1 = jnp.zeros((1, pay.shape[1]), f32)
        F = jnp.concatenate([f0u, f1u, f2u, f3, f4, f5, gate, z1],
                            axis=0)                             # (8, W)
        rgbT = pay[6:9, :].astype(bf16)                         # (3, W)
        return F, rgbT, jax.lax.bitcast_convert_type(
            pay[12:13, :], jnp.int32)

    def w_front(wA, wB):
        """in-front indicator: packed-rank compare (see eval_payload)."""
        return (wA < wB).astype(cdt)

    # At tile_size <= 16, tile-local pixf entries are small integers
    # (<= 15^2 = 225): EXACTLY bf16-representable, so splitting only F into
    # hi+lo bf16 halves gives ~2^-16-relative power accuracy in TWO MXU
    # passes (vs HIGHEST's six; Mosaic does not lower Precision.HIGH). The
    # group-local features (and tile-local at tile_size 32) exceed 256, so
    # they carry their own lo half and a third pass keeps the accuracy.
    # The hi/lo passes are FUSED into one matmul by stacking the split
    # halves along the contraction dim: [pb|pb] @ [Fh;Fl] == pb@Fh + pb@Fl
    # exactly (MXU accumulates in f32). Contraction dims 8/16/24 all pad to
    # the 128-deep systolic array, so the fused op costs the same as ONE
    # pass — this removes 1-2 MXU latencies per batch.
    pixf_b = pixf_b_ref[...]
    if tile_size > 16:
        pixf_cat = jnp.concatenate(
            [pixf_b, pixf_b, pixf_lo_ref[...]], axis=1)         # (NPX, 24)
    else:
        pixf_cat = jnp.concatenate([pixf_b, pixf_b], axis=1)    # (NPX, 16)

    # Round 5, measured on real v5e (benchmarks/vpu_probe.py): Mosaic lowers
    # exp/log1p to the VPU's hardware transcendental path at ~2.5x the rate
    # of the fexp/fln_one_minus polynomials (builtin eval chain 55 G/s vs
    # 22 G/s) — the r3 software approximations were a pessimization on
    # hardware. Builtins on both precision paths; the polys remain for the
    # XLA-simplifier regression tests.
    k_exp = jnp.exp
    k_ln1m = lambda a: jnp.log1p(-a)  # noqa: E731

    def mm_power(F_all):
        Fh = F_all.astype(bf16)
        Fl = (F_all - Fh.astype(f32)).astype(bf16)
        parts = [Fh, Fl] + ([Fh] if tile_size > 16 else [])
        P = jax.lax.dot_general(
            pixf_cat, jnp.concatenate(parts, axis=0),
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        if "xexp" in ablate:   # ablation: eval matmul infra without the
            alpha = jnp.minimum(P * 1e-4 + 0.005, ALPHA_MAX)  # transcendentals
            return alpha, -alpha
        alpha = jnp.minimum(k_exp(P), ALPHA_MAX)
        la = k_ln1m(alpha)
        return alpha, la

    # --- init per-group state -----------------------------------------------
    cols_v[...] = jnp.zeros((NPXG, 8), f32)

    # --- resident big lanes: thin pre-pass over the PRECOMPUTED la map ------
    # prepass_big_la already ran eval + power matmul + exp for every group
    # in one batched XLA computation; here only the order-dependent pieces
    # remain: the intra-big occlusion triangle (one matmul), the rank/rgb/
    # depth rows, the per-pixel big mass total, and the depth bucket mask.
    LT_OB = lt_ob_ref[...]

    @pl.when(has_big)
    def _():
        lac = bigla_vmem[slot_r]                                # (NPXG, OBIG)
        # intra-big order = list order: the per-group big list is depth16-
        # sorted with stable (= source idx) ties, i.e. already (d, idx) lex
        big_z[...] = jax.lax.dot_general(
            lac, LT_OB, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        pay = big_vmem[slot_r]
        big_rgb[...] = jnp.concatenate(
            [pay[6:9, :].astype(bf16), jnp.zeros((1, obig), bf16)], axis=0)
        d_row = pay[12:13, :]
        i_row = jax.lax.bitcast_convert_type(pay[13:14, :], jnp.int32)
        d_i = jnp.minimum(d_row, 65535.0).astype(jnp.int32)
        big_d[...] = d_row
        big_w[...] = ((d_i << 16) | ((i_row >> 7) & 0xFFFF)) ^ jnp.int32(
            -0x80000000)
        cols_v[:, 6:7] = jnp.sum(lac.astype(f32), axis=1, keepdims=True)
        # (the straddle gate reads the per-group depth-bucket PREFIX row —
        # header row 5, built in bin_bigs — with two scalar SMEM reads per
        # batch; the old in-kernel 32-bucket occupancy mask fired
        # near-always at headline density and cost ~40 vector ops per tile)

    # --- chain batch ring (shared by the group's tiles; each tile drains
    # before the next starts, and its batch 0 is prefetched from the
    # previous tile's tail) ---------------------------------------------------
    def start_batch(k, nb, g):
        for u in range(U):
            pos = k * U + u
            @pl.when(pos < nb)
            def _(u=u, pos=pos):
                pltpu.make_async_copy(
                    payload_hbm.at[block_id(pos, slot_r, g)],
                    pay_vmem.at[jax.lax.rem(k, 2), :, pl.ds(u * S, S)],
                    sems.at[jax.lax.rem(k, 2), u]).start()

    def wait_batch(k, nb):
        for u in range(U):
            pos = k * U + u
            @pl.when(pos < nb)
            def _(u=u, pos=pos):
                pltpu.make_async_copy(
                    payload_hbm.at[0],
                    pay_vmem.at[jax.lax.rem(k, 2), :, pl.ds(u * S, S)],
                    sems.at[jax.lax.rem(k, 2), u]).wait()

    def emit(la_b, z, rgbT4, rs, zc=None, al=None):
        """acc[rs] += (alpha * exp(z + zc)) @ rgb.

        With the batch's alpha available (al, chain batches): ONE exp —
        w = exp(z) * alpha, exact since la = log1p(-alpha) by construction.
        Without it (resident big emit, whose alpha lives only in the la
        map): factored as exp(z) - exp(z + la) — two exps, no expm1 (which
        Mosaic does not lower). zc is an optional per-pixel (NPX, 1) z
        column (transmittance carry + uniform big front mass), deferred to
        here so the batch body never read-modify-writes the full
        (NPX, US) pend_z for per-pixel-uniform terms."""
        if zc is not None:
            z = z + zc
        if "xemit" in ablate:   # ablation: emission without its exp
            w = (z * 1e-4 + (al if al is not None
                             else -la_b).astype(f32)).astype(bf16)
        elif al is not None:
            w = (k_exp(z) * al.astype(f32)).astype(bf16)
        else:
            laf = la_b.astype(f32)
            w = (k_exp(z) - k_exp(z + laf)).astype(bf16)
        cols_v[rs, 0:4] += jax.lax.dot_general(
            w, rgbT4, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    # hoisted constants for the chain loop (per-lane block index at the
    # batch's lane granularity; rebuilt iotas inside the loop cost a vector
    # op per batch)
    lane_blk = jax.lax.broadcasted_iota(jnp.int32, (1, US), 1) // S

    def tile_body(g, _carry):
        nb = row_smem[slot_r, g * 8, 0]
        if "noloop" in ablate:   # ablation: fixed costs only
            nb = nb * 0
        rs = pl.ds(g * NPX, NPX)
        tile_x = group_x + g.astype(f32) * tsz

        def chain_batch(k, pay_all):
            grp = jax.lax.rem(k, 2)
            sc, sp = grp, 1 - grp

            bmin = jnp.int32(0x10000)
            bmax = jnp.int32(-1)
            for u in range(U):
                pos = k * U + u
                live = pos < nb
                mn, mx = block_mm(pos, g)
                bmin = jnp.where(live, jnp.minimum(bmin, mn), bmin)
                bmax = jnp.where(live, jnp.maximum(bmax, mx), bmax)

            live_v = lane_blk < (nb - k * U)                    # (1, US)
            F_all, rgbT, w_cur = eval_payload(
                pay_all, live_v, tile_x, group_y, tsz, tsz)
            if "eval" in ablate:
                la = jnp.full((NPX, US), -0.01, f32)
                al = jnp.full((NPX, US), 0.00995, f32)
            else:
                al, la = mm_power(F_all)                        # (NPX, US)
            lac = la.astype(cdt)
            tot = jnp.sum(la, axis=1, keepdims=True)            # (NPX, 1)

            # intra-batch exact order matrix: lane i in front of lane j by
            # the packed (depth16, idx/128) rank — blocks2 does not depth-
            # sort block interiors; this matrix IS the sort, with exact-mode
            # tie semantics
            w_col = w_cur.reshape(US, 1)
            if "cums" in ablate:
                cums = jnp.zeros((NPX, US), f32)
            else:
                M = w_front(w_col, w_cur)
                cums = jax.lax.dot_general(
                    lac, M, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)                 # (NPX, US)

            if "pend" not in ablate:
                pend_la[sc] = lac
                pend_al[sc] = al.astype(bf16)
                pend_rgb[sc] = jnp.concatenate(
                    [rgbT, jnp.zeros((1, US), bf16)], axis=0)
                pend_w[sc] = w_cur
                pend_z[sc] = cums
                pend_c[sc] = cols_v[rs, 4:5]

            # chain <-> big exchange. Exact in both directions: when a big
            # lane STRADDLES this batch's depth range, pay two masked
            # matmuls; in the common disjoint case, exact per-pixel mass
            # adds suffice (a big entirely before bmin is in front of every
            # batch lane; a batch is entirely in front of any big past bmax)
            bminf = bmin.astype(f32)
            bmaxf = bmax.astype(f32)
            d_big = big_d[...]
            # scalar straddle gate off the big depth-bucket PREFIX (header
            # row 5, 512-depth16 buckets): live lanes in [bmin, bmax]'s
            # bucket span = prefix[b1] - prefix[b0 - 1]. Conservative:
            # bucket granularity can fire the exact matmul path spuriously,
            # never the reverse — results are bit-identical either way.
            b0 = jnp.clip(bmin >> 9, 0, 127)
            b1 = jnp.clip(bmax >> 9, 0, 127)
            n_hi = row_smem[slot_r, 5, b1]
            n_lo = jnp.where(b0 > 0,
                             row_smem[slot_r, 5, jnp.maximum(b0 - 1, 0)], 0)
            strad = has_big & (bmax >= bmin) & (n_hi - n_lo != 0)
            if "bigx" in ablate:
                strad = strad & (nb < 0)
                has_big_x = has_big & (nb < 0)
            else:
                has_big_x = has_big
            @pl.when(strad)
            def _():
                w_big = big_w[...]
                mask_bc = w_front(w_big.reshape(obig, 1), w_cur)
                pend_z[sc] += jax.lax.dot_general(
                    bigla_vmem[slot_r, rs], mask_bc,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)                 # (NPX, US)
                mask_cb = w_front(w_col, w_big)                 # (US, OBIG)
                big_z[rs] += jax.lax.dot_general(
                    lac, mask_cb, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
            @pl.when(has_big_x & ~strad)
            def _():
                bfm = jnp.sum(bigla_vmem[slot_r, rs].astype(f32)
                              * (d_big < bminf),
                              axis=1, keepdims=True)            # (NPX, 1)
                pend_c[sc] += bfm
                big_z[rs] += tot * (d_big > bmaxf).astype(f32)

            # cross-batch lag-1 corrections (gated on depth-range overlap)
            p_live = k > 0
            ovl_p = p_live & (bmin <= meta[1]) & (bmax >= meta[0])
            if "corr" in ablate:
                ovl_p = p_live & (nb < 0)
            @pl.when(ovl_p)
            def _():
                w_p = pend_w[sp]
                mf = w_front(w_col, w_p)                        # (USc, USp)
                pend_z[sp] += jax.lax.dot_general(
                    lac, mf, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                # prev mass NOT in front of each current lane (1 - rank-lt)
                mb = 1.0 - w_front(w_p.reshape(US, 1), w_cur)
                pend_z[sc] -= jax.lax.dot_general(
                    pend_la[sp], mb, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)

            if "emit" not in ablate:
                @pl.when(p_live)
                def _():
                    emit(pend_la[sp], pend_z[sp], pend_rgb[sp], rs,
                         zc=pend_c[sp], al=pend_al[sp])
            tcar = cols_v[rs, 4:5] + tot
            cols_v[rs, 4:5] = tcar
            if early_exit:
                # exit metric: chain mass + big mass certainly in front of
                # every future block (future min_depth >= current bmin).
                # Reduced to an SMEM flag HERE (inside the body, where the
                # vector pipeline is already hot) so the while cond below is
                # pure scalar — a vector reduction in the cond stalls the
                # scalar core on the VPU once per iteration.
                bexit = jnp.where(
                    has_big,
                    jnp.sum(bigla_vmem[slot_r, rs].astype(f32)
                            * (d_big < bminf),
                            axis=1, keepdims=True),
                    jnp.zeros((NPX, 1), f32))
                meta[4] = (jnp.max(tcar + bexit)
                           > LOG_MIN_ALPHA).astype(jnp.int32)
            meta[0] = bmin
            meta[1] = bmax

        def body(k):
            # the DMA ring is a contiguous (PW, US) slab per slot (each
            # block lands at its lane offset), so the batch payload is ONE
            # VMEM read — no per-batch concatenation
            wait_batch(k, nb)
            start_batch(k + 1, nb, g)
            chain_batch(k, pay_vmem[jax.lax.rem(k, 2)])
            return k + 1

        def cond(k):
            go = (k * U < nb) & (k < max_batches)
            if early_exit:
                go = go & (meta[4] != 0)
            return go

        if early_exit:
            meta[4] = jnp.int32(1)

        # --- slab batches: the first slab_u batches read the XLA-pre-
        # gathered contiguous slab (auto-pipelined by Pallas) — zero DMA
        # machinery for the ~2 batches early exit leaves live on most
        # tiles; only deeper tiles fall through to the DMA ring ----------
        k0 = jnp.int32(0)   # slab batches actually executed: the while (and
        # the final emit below) must resume from the EXECUTED count — a tile
        # that exits inside the slab would otherwise emit a stale pend slot
        for kk in range(slab_u):
            go_k = (kk * U < nb) & (kk < max_batches)
            if early_exit and kk > 0:
                go_k = go_k & (meta[4] != 0)

            @pl.when(go_k)
            def _(kk=kk):
                chain_batch(jnp.int32(kk),
                            slab_ref[0, :, kk * US:(kk + 1) * US])
            k0 = jnp.where(go_k, jnp.int32(kk + 1), k0)

        ring_go = cond(k0)
        if slab_u > 0:
            @pl.when(ring_go)
            def _():
                start_batch(k0, nb, g)
        k_end = jax.lax.while_loop(cond, body, k0)
        @pl.when(ring_go)
        def _():
            wait_batch(k_end, nb)   # drain the in-flight ring batch

        # prefetch the NEXT tile's batch 0 now: either the next tile of this
        # group (rows already resident), or tile 0 of the next group (its
        # rows arrived during this group; the emits below hide the DMA)
        @pl.when(g + 1 < G)
        def _():
            start_batch0(slot_r, g + 1)
        @pl.when((g + 1 == G) & (t + 1 < num_groups))
        def _():
            pltpu.make_async_copy(rows_hbm.at[0], row_smem.at[1 - slot_r],
                                  row_sems.at[1 - slot_r]).wait()
            start_batch0(1 - slot_r, 0)

        @pl.when(k_end > 0)
        def _():
            sp = jax.lax.rem(k_end - 1, 2)
            emit(pend_la[sp], pend_z[sp], pend_rgb[sp], rs,
                 zc=pend_c[sp], al=pend_al[sp])

        # diagnostics channel: chain blocks processed for this tile
        cols_v[rs, 7:8] = jnp.broadcast_to(
            jnp.minimum(k_end * U, nb).astype(f32), (NPX, 1))
        return _carry

    jax.lax.fori_loop(0, GROUP, tile_body, jnp.int32(0))

    # one final big emit + present for the WHOLE group
    @pl.when(has_big)
    def _():
        emit(bigla_vmem[slot_r], big_z[...], big_rgb[...], pl.ds(0, NPXG))

    t_exp = cols_v[:, 4:5] + jnp.where(has_big, cols_v[:, 6:7],
                                       jnp.zeros((NPXG, 1), f32))
    t_final = jnp.exp(t_exp)                                    # (NPXG, 1)

    # --- present: heatmap mix + channel assembly ----------------------------
    pix_tile = jax.lax.broadcasted_iota(jnp.int32, (NPXG, 1), 0) // NPX
    mixf = jnp.zeros((NPXG, 1), f32)
    nb_px = jnp.zeros((NPXG, 1), f32)
    for g in range(GROUP):
        mixf = jnp.where(pix_tile == g,
                         row_smem[slot_r, g * 8, 1].astype(f32) * 5e-4, mixf)
        nb_px = jnp.where(pix_tile == g,
                          row_smem[slot_r, g * 8, 0].astype(f32), nb_px)
    cov = (1.0 - t_final) * hm_f
    ch = jax.lax.broadcasted_iota(jnp.int32, (NPXG, OUT_CH), 1)
    hm = jnp.where(ch == 0, 1.0 * mixf,
                   jnp.where(ch == 1, 0.2 * mixf,
                             jnp.where(ch == 2, 1.0 - 0.8 * mixf, 0.0))) * cov

    acc = cols_v[:, 0:3]
    rgb_full = jnp.concatenate(
        [acc, jnp.zeros((NPXG, OUT_CH - 3), f32)], axis=1)
    out = rgb_full + hm
    out = jnp.where(ch == 3, 1.0, out)
    out = jnp.where(ch == 4, t_final, out)
    # diagnostics: ch5 = chain blocks processed, ch6 = nb, ch7 = nbig (group)
    out = jnp.where(ch == 5, cols_v[:, 7:8], out)
    out = jnp.where(ch == 6, nb_px, out)
    out = jnp.where(ch == 7, nbig.astype(f32), out)
    # write CHANNEL-MAJOR per tile: (NPXG, 8) transposed in-kernel (a few
    # vector shuffles) so the post-kernel image assembly never touches a
    # channels-minor layout — the old (TG, NPX, 8) buffer cost ~7 ms/frame
    # in XLA relayouts at the 1080p headline (channels-minor transposes at
    # 4/128 lane utilization + a crop copying at ~10 GB/s). Writing the
    # planar (OUT_CH, H, W) image directly from the kernel is not
    # expressible today: a (OUT_CH, ts, ts) output block violates Mosaic's
    # (8, 128) block-minor divisibility, and the row-block alternative
    # needs dynamic-lane-offset vector stores, which Mosaic rejects.
    out_ref[0] = jnp.transpose(out, (1, 0))


def pack_tile_rows_v3(tile_blocks, tile_nblocks, tile_nbig, tile_minmax,
                      tile_candidates, heatmap_factor, cfg,
                      pixel_offset_y=0, tile_big_prefix=None):
    """Tile lists -> (TG, GROUP*8, 128) i32 group rows. Per tile g the 8-row
    section holds row0 = [nb, cand, hm16.16, y_off, nbig(group; tile 0
    only)], rows 1-2 = block ids, rows 3-4 = minmax, row 5 (tile 0 only) =
    the group's big depth-bucket prefix (TileBigs.big_prefix; when absent
    an iota+1 fallback makes the straddle gate fire on every batch — the
    conservative always-exact path), rows 6-7 spare (feature centers ride
    payload rows 14/15). Tiles padding gx up to a GROUP multiple get
    nb = 0."""
    gx, gy = cfg.tile_dims
    T, C2 = tile_blocks.shape
    assert T == gx * gy and C2 <= 256
    gx2 = -(-gx // GROUP)
    gxp = gx2 * GROUP
    TG = gx2 * gy
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
        [hdr, sect(tile_blocks), sect(tile_minmax),
         jnp.zeros((T, 3 * 128), jnp.int32)], axis=1).reshape(T, 8, 128)
    if gxp != gx:
        rows = jnp.pad(rows.reshape(gy, gx, 8, 128),
                       ((0, 0), (0, gxp - gx), (0, 0), (0, 0)))
    rows = rows.reshape(TG, GROUP, 8, 128)
    # group big count rides tile 0's header slot 4
    rows = rows.at[:, 0, 0, 4].set(tile_nbig.astype(jnp.int32))
    if tile_big_prefix is None:   # conservative fallback: gate always fires
        tile_big_prefix = jnp.broadcast_to(
            jnp.arange(1, 129, dtype=jnp.int32)[None], (rows.shape[0], 128))
    rows = rows.at[:, 0, 5, :].set(tile_big_prefix.astype(jnp.int32))
    return rows.reshape(TG, GROUP * 8, 128)


def _group_pixel_coords(cfg):
    """Group-local pixel coordinates (NPXG,) xs, ys: pixels of GROUP
    horizontally contiguous tiles, tile-major (matching the kernel's
    per-tile NPX slices and assemble_image_v3's unpacking)."""
    import numpy as _np
    ts = cfg.tile_size
    NPX = ts * ts
    pixg = _np.arange(GROUP * NPX)
    xs = (pixg // NPX) * ts + (pixg % NPX) % ts
    ys = (pixg % NPX) // ts
    return xs.astype(_np.float32), ys.astype(_np.float32)


def prepass_big_la(bigpay, cfg, lowp: bool = True, pixel_offset_y=0):
    """(TG, PW, OBIG) big-lane payloads -> (TG, G*NPX, OBIG) log1p(-alpha).

    The big-lane eval (feature re-centering to the group origin, the
    NPXG x OBIG power matmul, exp, coverage gate) as ONE batched XLA
    computation over every group. Inside the Pallas kernel this was ~35
    small per-group ops running for ~98% of tiles on a sequential grid —
    pure op-issue overhead; batched here the identical math is
    throughput-bound (~2 GMAC + one la-map write that the kernel streams
    back through a double-buffered DMA ring). The kernel keeps only the
    order-dependent pieces (intra-big occlusion triangle, rank rows,
    depth bucket mask). Mirrors eval_payload + mm_power exactly; XLA's
    Precision.HIGHEST replaces the kernel's 2-pass bf16 hi/lo split
    (Mosaic cannot lower HIGHEST; XLA proper can)."""
    f32 = jnp.float32
    gx, _ = cfg.tile_dims
    gx2 = -(-gx // GROUP)
    ts = float(cfg.tile_size)
    TG = bigpay.shape[0]
    t = jnp.arange(TG, dtype=jnp.int32)
    ox = (jax.lax.rem(t, gx2) * (GROUP * cfg.tile_size)
          ).astype(f32)[:, None]                                # (TG, 1)
    oy = ((t // gx2) * cfg.tile_size
          + jnp.asarray(pixel_offset_y, jnp.int32)).astype(f32)[:, None]

    pay = bigpay.astype(f32)                                    # (TG, PW, OB)
    dx = ox - pay[:, 14]
    dy = oy - pay[:, 15]
    f0u = (pay[:, 0] + dx * pay[:, 1] + dy * pay[:, 2]
           + dx * dx * pay[:, 3] + dy * dy * pay[:, 4] + dx * dy * pay[:, 5])
    f1u = pay[:, 1] + 2.0 * dx * pay[:, 3] + dy * pay[:, 5]
    f2u = pay[:, 2] + 2.0 * dy * pay[:, 4] + dx * pay[:, 5]
    rw = jax.lax.bitcast_convert_type(pay[:, 11], jnp.uint32)
    rxw = jax.lax.bitcast_convert_type(
        (rw & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(f32)
    ryw = jax.lax.bitcast_convert_type(
        (rw >> 16).astype(jnp.uint16), jnp.bfloat16).astype(f32)
    ixr, iyr = pay[:, 9], pay[:, 10]
    covered = ((ixr - rxw < ox + GROUP * ts) & (ixr + rxw > ox)
               & (iyr - ryw < oy + ts) & (iyr + ryw > oy))
    gate = jnp.where(covered, 0.0, GATE_OFF)
    F = jnp.stack([f0u, f1u, f2u, pay[:, 3], pay[:, 4], pay[:, 5],
                   gate, jnp.zeros_like(gate)], axis=1)         # (TG, 8, OB)
    xs, ys = _group_pixel_coords(cfg)
    import numpy as _np
    ones = _np.ones_like(xs)
    pixf = jnp.asarray(_np.stack(
        [ones, xs, ys, xs * xs, ys * ys, xs * ys, ones,
         _np.zeros_like(xs)], axis=1))                          # (NPXG, 8)
    P = jnp.einsum("pf,tfo->tpo", pixf, F,
                   precision=jax.lax.Precision.HIGHEST)
    alpha = jnp.minimum(jnp.exp(P), ALPHA_MAX)
    return jnp.log1p(-alpha).astype(
        jnp.bfloat16 if lowp else jnp.float32)


def render_tiles_v3(
    payload: jnp.ndarray,          # (B, PW, S) f32
    bins,                          # TileBins2
    tile_bigs,                     # TileBigs (ops/bigbin.py, per group)
    heatmap_factor: jnp.ndarray,   # () f32
    cfg: RasterizerConfig,
    early_exit: bool = True,
    lowp: bool = True,
    interpret: bool = False,
    pixel_offset_y=0,
    batch_u: int | None = None,
    slab_u: int | None = None,
    ablate: str | None = None,
):
    """Launch the v3 kernel over the group grid -> (TG, GROUP*NPX, OUT_CH)
    group pixel buffer (assemble_image_v3 / tile_t_final unpack it).

    batch_u / ablate are explicit static knobs (benchmark ablation hooks);
    when left None they fall back to the GS_BATCH_U / GS_KERNEL_ABLATE env
    vars for command-line sweeps — with a loud warning for ablate, since a
    stray env var would silently corrupt production renders (and changing
    either after first compile is ignored by the jit cache)."""
    gx, gy = cfg.tile_dims
    gx2 = -(-gx // GROUP)
    TG = gx2 * gy
    NPX = cfg.tile_size * cfg.tile_size
    NPXG = GROUP * NPX
    if jax.default_backend() == "cpu":
        interpret = True   # Mosaic kernels only compile for TPU

    obig = tile_bigs.bigpay.shape[2]
    import os as _os
    if batch_u is None:
        if "GS_BATCH_U" in _os.environ:     # benchmark sweep override only
            batch_u = int(_os.environ["GS_BATCH_U"])
        else:
            batch_u = cfg.batch_u or default_batch_u(cfg.tile_size)
    Un = batch_u
    C2 = bins.tile_blocks.shape[1]
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
                             heatmap_factor, cfg, pixel_offset_y,
                             tile_big_prefix=getattr(tile_bigs, "big_prefix",
                                                     None))
    US = Un * BLOCK_SIZE
    # words payload: (B, 8, S) u32 sorted-word image (in-kernel cook);
    # cooked payload: (B, 16, S) f32 — selected by dtype, no extra plumbing
    words = payload.dtype == jnp.uint32
    PW = payload.shape[1]
    kern = functools.partial(
        _render_kernel_v3, gx2=gx2, tile_size=cfg.tile_size, num_groups=TG,
        early_exit=early_exit, lowp=lowp, max_batches=max_batches,
        obig=obig, U=Un, ablate=ablate, words=words)

    # static pixel-feature constants, pipelined in ONCE (constant block
    # index): tile-local features for the chain batches, and the strict
    # big-lane order triangle
    ts = cfg.tile_size
    import numpy as _np

    def pix_features(npx, xs, ys):
        ones = _np.ones(npx, _np.float32)
        f = _np.stack([ones, xs, ys, xs * xs, ys * ys, xs * ys,
                       ones, _np.zeros(npx, _np.float32)], axis=1)
        hi = f.astype(jnp.bfloat16)
        lo = (f - hi.astype(_np.float32)).astype(jnp.bfloat16)
        return hi, lo

    pix = _np.arange(NPX)
    pixf_b_np, pixf_lo_np = pix_features(
        NPX, (pix % ts).astype(_np.float32), (pix // ts).astype(_np.float32))
    lt_ob_np = (_np.arange(obig)[:, None] < _np.arange(obig)[None, :]).astype(
        jnp.bfloat16 if lowp else _np.float32)

    bigla = prepass_big_la(tile_bigs.bigpay, cfg, lowp=lowp,
                           pixel_offset_y=pixel_offset_y)

    # Chain slab: the first slab_u batches of every tile's block list,
    # gathered in XLA into ONE contiguous per-tile slab that Pallas
    # auto-pipelines — no per-block DMA machinery for the batches early
    # exit typically leaves live (measured ~8% of binned blocks at the
    # headline); deeper tiles fall through to the in-kernel DMA ring.
    if slab_u is None:
        if "GS_SLAB_U" in _os.environ:      # benchmark sweep override only
            slab_u = int(_os.environ["GS_SLAB_U"])
        else:
            slab_u = cfg.slab_u
    if GROUP != 1:
        slab_u = 0   # slab indexing is per true tile
    # only FULL batches can ride the slab (a partial final batch would need
    # more block columns than tile_blocks carries); the ring serves the tail
    slab_u = min(slab_u, C2 // Un)
    if slab_u > 0:
        Wb = slab_u * Un
        ids = jnp.maximum(bins.tile_blocks[:, :Wb], 0).astype(jnp.int32)
        slab = payload[ids.reshape(-1)]                 # (TG*Wb, PW, S)
        slab = slab.reshape(TG, Wb, PW, BLOCK_SIZE)
        slab = slab.transpose(0, 2, 1, 3).reshape(
            TG, PW, Wb * BLOCK_SIZE)
        slab_spec = pl.BlockSpec((1, PW, Wb * BLOCK_SIZE),
                                 lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        slab = jnp.zeros((1, PW, BLOCK_SIZE), payload.dtype)
        slab_spec = pl.BlockSpec((1, PW, BLOCK_SIZE),
                                 lambda t: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    kern = functools.partial(kern, slab_u=slab_u)

    # Mosaic compiler params: the grid dimension must stay "arbitrary"
    # (sequential) — the DMA rings deliberately overlap fetches across grid
    # steps and wait on cross-step semaphores. kernel_vmem_mb raises the
    # scoped VMEM budget for scratch-heavy shape combinations.
    cparams = None
    if cfg.kernel_vmem_mb is not None:
        cparams = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=cfg.kernel_vmem_mb << 20)

    return pl.pallas_call(
        kern,
        grid=(TG,),
        compiler_params=cparams,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            slab_spec,
            pl.BlockSpec((NPX, 8), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NPX, 8), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((obig, obig), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OUT_CH, NPXG), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TG, OUT_CH, NPXG), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((2, GROUP * 8, 128), jnp.int32),
            pltpu.SMEM((6,), jnp.int32),
            pltpu.VMEM((2, PW, Un * BLOCK_SIZE), payload.dtype),
            pltpu.VMEM((2, PAYLOAD_WIDTH, obig), jnp.float32),
            pltpu.VMEM((2, NPXG, obig), cdt),          # bigla ring
            pltpu.VMEM((2, NPX, US), jnp.float32),     # pend_z
            pltpu.VMEM((2, NPX, 1), jnp.float32),      # pend_c
            pltpu.VMEM((2, NPX, US), cdt),             # pend_la
            pltpu.VMEM((2, NPX, US), jnp.bfloat16),    # pend_al
            pltpu.VMEM((2, 4, US), jnp.bfloat16),      # pend_rgb
            pltpu.VMEM((2, 1, US), jnp.int32),         # pend_w
            pltpu.VMEM((NPXG, obig), jnp.float32),     # big_z
            pltpu.VMEM((4, obig), jnp.bfloat16),       # big_rgb
            pltpu.VMEM((1, obig), jnp.float32),        # big_d
            pltpu.VMEM((1, obig), jnp.int32),          # big_w
            pltpu.VMEM((NPXG, 8), jnp.float32),        # cols
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, Un)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rows, payload, tile_bigs.bigpay, bigla, slab, jnp.asarray(pixf_b_np),
      jnp.asarray(pixf_lo_np), jnp.asarray(lt_ob_np))


def tile_channels_v3(tiles: jnp.ndarray, cfg: RasterizerConfig):
    """(TG, OUT_CH, GROUP*NPX) kernel buffer -> (T, NPX, C) per true tile."""
    gx, gy = cfg.tile_dims
    gx2 = -(-gx // GROUP)
    NPX = cfg.tile_size * cfg.tile_size
    C = tiles.shape[1]
    t4 = tiles.reshape(gy, gx2 * GROUP, C, NPX)
    return t4[:, :gx].reshape(gy * gx, C, NPX).transpose(0, 2, 1)


def assemble_image_v3(tiles: jnp.ndarray, cfg: RasterizerConfig):
    """(TG, OUT_CH, GROUP*NPX) channel-major kernel buffer ->
    ((4, H, W) PLANAR image, (T, NPX) t_final).

    The kernel transposes each tile's pixels to channel-major in-kernel,
    so this untiling never touches a channels-minor layout — the previous
    (TG, NPX, 8) pixel-major buffer cost ~7 ms/frame in XLA relayouts at
    the 1080p headline (channels-minor transposes at 4/128 lane
    utilization, and even the 1088 -> 1080 crop copied at ~10 GB/s in
    that layout). Hosts get (H, W, 4) back with a free np.moveaxis view
    (utils/image.hwc). Parity note: the reference renders into an opaque
    GPU-tiled texture too (gaussian_splatting_rasterizer.gd:26-48) —
    channel order there is equally a present-time concern."""
    gx, gy = cfg.tile_dims
    gx2 = -(-gx // GROUP)
    ts = cfg.tile_size
    w, h = cfg.target_size
    t_final = tiles[:, 4].reshape(gy, gx2 * GROUP, ts * ts)
    t_final = t_final[:, :gx].reshape(gy * gx, ts * ts)
    chp = tiles.transpose(1, 0, 2)[:4]            # (4, TG, G*NPX)
    img = chp.reshape(4, gy, gx2 * GROUP, ts, ts)
    img = img.transpose(0, 1, 3, 2, 4).reshape(
        4, gy * ts, gx2 * GROUP * ts)
    return img[:, :h, :w], t_final
