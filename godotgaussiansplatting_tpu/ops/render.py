"""Stage 4: per-tile back-to-front premultiplied-alpha compositing.

TPU-native equivalent of `gsplat_render.glsl` (one 16×16 workgroup per tile,
shared-memory chunked loads, cooperative saturation exit). Two key mappings:

* The GPU's sequential `t *= (1-alpha)` loop with its `t > 1/255` check
  (gsplat_render.glsl:79-91) is exactly the prefix-product formulation
      contrib_j = rgb_j · α_j · P_j · [P_j > 1/255],   P_j = Π_{k<j} (1-α_k)
  because P is monotone non-increasing, so the processed set is always a
  prefix. This turns the loop into cumprod + reduction — fully vectorizable.
* The cooperative block exit (gsplat_render.glsl:45-48,64-99) only changes
  *which chunks get loaded*, never the per-pixel result, so it needs no
  equivalent here; the Pallas kernel reintroduces it as a perf optimization.

This module is the XLA fallback/oracle-grade renderer (correct everywhere,
gather-bound); `ops/render_pallas3.py` holds the performance kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MIN_FACTOR, RasterizerConfig


class RenderOutput(NamedTuple):
    image: jnp.ndarray        # (H, W, 4) f32, alpha = 1
    tile_t0: jnp.ndarray      # (T,) f32 — final transmittance of each tile's
                              # (0,0) pixel (the picking `t != 1` probe,
                              # gsplat_render.glsl:105)
    tile_counts: jnp.ndarray  # (T,) i32 — per-tile splat counts (heatmap/stats)


def _blend_chunk(
    ids, slot_valid, px, py, q_in,
    image_pos, conic, color,
):
    """Composite one CHUNK of slots for a batch of tiles.

    ids: (B, CH) splat ids; slot_valid: (B, CH); px/py: (B, 256) pixel
    coords; q_in: (B, 256) transmittance after the last PROCESSED slot of
    the previous chunks. Returns (chunk contribution (B, 256, 3), q_out).

    Exactness: q is monotone non-increasing, so the reference's per-pixel
    `t > 1/255` check (gsplat_render.glsl:79) makes the processed set a
    PREFIX — chunking with a carried q is the same sequential product in
    the same order."""
    ipos = image_pos[ids]                       # (B, CH, 2)
    con = conic[ids]                            # (B, CH, 3)
    col = color[ids]                            # (B, CH, 4)

    dx = ipos[:, :, 0:1] - px[:, None, :]       # (B, CH, 256)
    dy = ipos[:, :, 1:2] - py[:, None, :]
    power = (-0.5 * (con[:, :, 0:1] * dx * dx + con[:, :, 2:3] * dy * dy)
             - con[:, :, 1:2] * dx * dy)        # gsplat_render.glsl:84
    alpha = col[:, :, 3:4] * jnp.exp(power)     # no clamps — quirk (:85-87)
    alpha = jnp.where(slot_valid[:, :, None], alpha, 0.0)

    one_m = 1.0 - alpha
    p_incl = q_in[:, None, :] * jnp.cumprod(one_m, axis=1)
    # Exclusive prefix (shift; exact even when some (1-α) == 0):
    p_excl = jnp.concatenate([jnp.broadcast_to(q_in[:, None, :],
                                               p_incl[:, :1].shape),
                              p_incl[:, :-1]], axis=1)

    processed = p_excl > (1.0 / MIN_FACTOR)     # the `t > MIN_ALPHA` check (:79)
    w = alpha * p_excl * processed
    blended = jnp.einsum("bcp,bck->bpk", w, col[:, :, :3])  # (B, 256, 3)

    # q after this chunk = transmittance at the last processed slot
    # (processed is a prefix, so the product over processed slots only).
    q_out = q_in * jnp.prod(jnp.where(processed, one_m, 1.0), axis=1)
    return blended, q_out


def render_tiles(
    sorted_values: jnp.ndarray,   # (K_max,) i32 splat ids, sorted pair order
    tile_start: jnp.ndarray,      # (T,) i32
    tile_end: jnp.ndarray,        # (T,) i32
    image_pos: jnp.ndarray,       # (P, 2)
    conic: jnp.ndarray,           # (P, 3)
    color: jnp.ndarray,           # (P, 4)
    heatmap_factor: jnp.ndarray,  # scalar f32 (0 or 1; main.gd:50)
    cfg: RasterizerConfig,
    tile_capacity: int = 2048,
    tile_batch: int = 16,
    pixel_offset=(0, 0),
) -> RenderOutput:
    """XLA renderer. tile_capacity statically bounds per-tile list length
    (tiles beyond it are truncated at the far end — the Pallas kernel has no
    such cap; telemetry reports `max_tile_count` so overflow is observable).
    pixel_offset shifts tile pixel coordinates — used by the multi-chip path,
    where each device renders a slab of a larger image whose image_pos values
    are global."""
    gx, gy = cfg.tile_dims
    T = gx * gy
    K = sorted_values.shape[0]
    C = tile_capacity
    ts = cfg.tile_size

    counts = tile_end - tile_start
    tids = jnp.arange(T, dtype=jnp.int32)
    tpx = (tids % gx) * ts + pixel_offset[0]
    tpy = (tids // gx) * ts + pixel_offset[1]

    # Pad T to a multiple of the batch.
    TB = tile_batch
    T_pad = (T + TB - 1) // TB * TB
    pad = T_pad - T
    start_p = jnp.pad(tile_start, (0, pad))
    end_p = jnp.pad(tile_end, (0, pad))
    tpx_p = jnp.pad(tpx, (0, pad))
    tpy_p = jnp.pad(tpy, (0, pad))
    cnt_p = jnp.pad(counts, (0, pad))

    # Slot-CHUNKED per-tile composite with a carried transmittance and a
    # saturation early-exit: the monolithic (TB, C, 256) formulation
    # materialized ~8 arrays of C=4-8K slots per batch (HBM-bound) and
    # always paid the full tile_capacity even though the reference's
    # per-pixel `t > 1/255` check saturates most tiles within a few
    # hundred slots (gsplat_render.glsl:79's early-out, which its
    # cooperative block exit turns into skipped loads, :45-48).
    CH = min(512, C)
    n_ch = -(-C // CH)
    lx = jnp.arange(ts, dtype=jnp.float32)

    def body(args):
        s, e, x, y, n = args
        px = x[:, None].astype(jnp.float32) + jnp.tile(lx, ts)[None, :]
        py = y[:, None].astype(jnp.float32) + jnp.repeat(lx, ts)[None, :]
        # seed the carry from a VARYING input (the per-shard pair values —
        # tile coordinates are invariant arange math): under shard_map the
        # while carry must enter with the body outputs' varying manual
        # axes, and a literal zeros init is device-invariant
        vz = sorted_values[0].astype(jnp.float32) * 0.0
        q0 = jnp.ones((TB, ts * ts), jnp.float32) + vz
        acc0 = jnp.zeros((TB, ts * ts, 3), jnp.float32) + vz

        def chunk_live(k, q):
            has_slots = jnp.any(s + k * CH < e)
            unsat = jnp.any(q > (1.0 / MIN_FACTOR))
            return (k < n_ch) & has_slots & unsat

        def chunk_body(carry):
            k, acc, q = carry
            slots = (s[:, None] + k * CH
                     + jnp.arange(CH, dtype=jnp.int32)[None, :])
            valid = slots < e[:, None]
            ids = sorted_values[jnp.clip(slots, 0, K - 1)]
            contrib, q2 = _blend_chunk(ids, valid, px, py, q,
                                       image_pos, conic, color)
            return k + 1, acc + contrib, q2

        _, blended, q = jax.lax.while_loop(
            lambda c: chunk_live(c[0], c[2]), chunk_body,
            (jnp.int32(0), acc0, q0))
        t_final = q

        # Heatmap overlay (gsplat_render.glsl:100-101): unclamped lerp
        # blue→red by count·5e-4, scaled by opacity-coverage + the factor.
        mixf = n.astype(jnp.float32)[:, None] * 5e-4
        blue = jnp.array([0.0, 0.0, 1.0], jnp.float32)
        red = jnp.array([1.0, 0.2, 0.2], jnp.float32)
        hm = (blue[None, None] + (red - blue)[None, None] * mixf[:, :, None])
        blended = blended + hm * ((1.0 - t_final)
                                  * heatmap_factor)[:, :, None]
        return blended, t_final

    nb = T_pad // TB
    blended, t_final = jax.lax.map(
        body,
        (start_p.reshape(nb, TB), end_p.reshape(nb, TB),
         tpx_p.reshape(nb, TB), tpy_p.reshape(nb, TB),
         cnt_p.reshape(nb, TB)),
    )
    blended = blended.reshape(T_pad, ts * ts, 3)[:T]
    t_final = t_final.reshape(T_pad, ts * ts)[:T]

    # Assemble (gy*16, gx*16) and crop to the render target.
    wpx, hpx = cfg.target_size
    img = blended.reshape(gy, gx, ts, ts, 3).transpose(0, 2, 1, 3, 4)
    img = img.reshape(gy * ts, gx * ts, 3)[:hpx, :wpx]
    rgba = jnp.concatenate(
        [img, jnp.ones((*img.shape[:2], 1), img.dtype)], axis=-1)
    return RenderOutput(image=rgba, tile_t0=t_final[:, 0], tile_counts=counts)
