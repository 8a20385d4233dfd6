"""Stage 2+3: duplicated-key emission, device sort, and tile-range boundaries.

TPU-native replacement for the reference's GPU-driven duplication
(gsplat_projection.glsl:196,216-226), its vendored 4-pass radix sort
(radix_sort_{upsweep,spine,downsweep}.glsl) and the boundary kernel
(gsplat_boundaries.glsl). XLA needs static shapes, so instead of an atomic
append counter the pipeline:

  1. reserves each splat's key range with an exclusive cumsum over its tile
     count (the deterministic analogue of atomicAdd at gsplat_projection.glsl:196),
  2. scatters (key, value) pairs into a fixed 10·N buffer (the reference's own
     worst-case bet, gaussian_splatting_rasterizer.gd:79) padded with
     INVALID_KEY, which sorts to the tail,
  3. sorts with a stable key-value sort,
  4. extracts per-tile [start, end) ranges from the sorted keys.

Key format matches gsplat_projection.glsl:218-222: key = tile_id << 16 | depth16.

Ordering note: the reference's pre-sort buffer order is *nondeterministic*
(concurrent atomicAdd ranges), so equal-key pair order is GPU-race dependent.
Ours is deterministic: splat id, then row-major rect order — a strict
improvement that stays within the reference's own behavior envelope.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import INVALID_KEY, RasterizerConfig


class SortedPairs(NamedTuple):
    keys: jnp.ndarray        # (K_max,) u32 sorted; INVALID_KEY padding at tail
    values: jnp.ndarray      # (K_max,) i32 splat ids
    num_pairs: jnp.ndarray   # ()  i32 valid pair count ("sort_buffer_size")
    num_overflow: jnp.ndarray  # () i32 pairs dropped by the per-splat tile cap
                               # (reference instead *detects* 10N overflow, main.gd:100)


def emit_and_sort(
    proj_valid: jnp.ndarray,    # (P,) bool
    rect: jnp.ndarray,          # (P, 4) i32 [x0, y0, x1, y1)
    num_tiles: jnp.ndarray,     # (P,) i32
    depth16: jnp.ndarray,       # (P,) u32
    cfg: RasterizerConfig,
    capacity: int | None = None,
    tiers=None,
) -> SortedPairs:
    """Emit (tile<<16|depth, splat_id) pairs and sort them (stages 2 of the
    reference frame, gaussian_splatting_rasterizer.gd:143-150).

    tiers: optional ((width, cap), ...) ladder (ascending widths, each a
    refinement between max_tiles_per_splat and the dense giant path;
    defaults to cfg.exact_tiers): a splat whose rect exceeds the base cap
    is COMPACTED into the smallest tier whose width covers it and emitted
    densely over that tier's (cap, width) matrix — so the 44-second oracle
    habit of raising max_tiles_per_splat GLOBALLY (a (P, 512) = 3-billion-
    slot key build at the 5.8M headline, FIDELITY_r04) is replaced by a
    few small dense matrices sized by the actual wide-splat population.
    Splats past a tier's cap keep the base truncation (counted in
    num_overflow); splats wider than the last tier go to the
    giant_splat_capacity full-rect path as before. Pre-sort buffer order
    becomes (base, tiers..., giants) instead of purely splat-major — this
    only permutes equal-(tile, depth16) tie order for wide splats, inside
    the reference's own race-nondeterminism envelope (module docstring)."""
    P = rect.shape[0]
    gx, _ = cfg.tile_dims
    k_max = capacity if capacity is not None else cfg.sort_buffer_factor * P
    max_t = cfg.max_tiles_per_splat
    if tiers is None:
        tiers = getattr(cfg, "exact_tiers", ()) or ()
    tiers = tuple((int(w), int(c)) for (w, c) in tiers if w > max_t)

    nt_capped = jnp.minimum(num_tiles, max_t)
    tier_taken = []
    prev_w = max_t
    for (w_t, cap_t) in tiers:
        elig = proj_valid & (num_tiles > prev_w) & (num_tiles <= w_t)
        trank = jnp.cumsum(elig.astype(jnp.int32)) - 1
        taken = elig & (trank < cap_t)
        nt_capped = jnp.where(taken, 0, nt_capped)
        tier_taken.append((w_t, cap_t, taken, trank))
        prev_w = w_t
    gcap = cfg.giant_splat_capacity
    if gcap:
        # Splats whose rect exceeds the last tier leave the capped loop
        # entirely and emit DENSELY over their full rect below (the
        # reference never drops pairs; without this the cap-32 default
        # truncated 1.7% of all pairs at the 5.8M/1080p headline — a
        # systematic luminance deficit). Only the first `gcap` giants (in
        # splat order) are taken; the rest keep the truncated capped-loop
        # emission.
        is_giant = proj_valid & (num_tiles > prev_w)
        grank = jnp.cumsum(is_giant.astype(jnp.int32)) - 1  # exclusive rank
        g_taken = is_giant & (grank < gcap)
        nt_capped = jnp.where(g_taken, 0, nt_capped)
    offsets = jnp.cumsum(nt_capped) - nt_capped          # exclusive prefix
    total = offsets[-1] + nt_capped[-1] if P else jnp.int32(0)

    rect_w = jnp.maximum(rect[:, 2] - rect[:, 0], 1)
    base_tile = rect[:, 1] * gx + rect[:, 0]             # top-left tile id
    splat_ids = jnp.arange(P, dtype=jnp.int32)

    # Emit VECTORIZED as a (P, max_t) matrix: slot t of splat i addresses
    # the t-th tile of its rect in row-major order
    # (gsplat_projection.glsl:219-226); dead slots carry INVALID_KEY and
    # stable-sort to the tail. An earlier masked-scatter formulation (one
    # full-buffer scatter pair per slot) ran 2 * max_t TPU scatters over
    # the 58M-slot buffer — device-profiled as the bulk of the exact frame
    # at the 5.8M headline. Equal-(tile,depth16) tie order is UNCHANGED:
    # both layouts are (splat-major, slot-minor) under the stable sort.
    tt = jax.lax.broadcasted_iota(jnp.int32, (P, max_t), 1)
    live = proj_valid[:, None] & (tt < nt_capped[:, None])
    # Emission-order overflow: the reference's sort buffer is a FIXED 10N
    # allocation populated splat-major (gaussian_splatting_rasterizer.gd:79,
    # gsplat_projection.glsl:196) — pairs past it never exist. Masking by
    # each pair's emission position reproduces that (drops spread across
    # late splats, usually saturated-over anyway). Slicing AFTER the sort
    # instead would delete the highest tile ids wholesale — blanking the
    # bottom of the frame on overflow (round-5 regression fix).
    live = live & (offsets[:, None] + tt < k_max)
    ty = tt // rect_w[:, None]
    tx = tt - ty * rect_w[:, None]
    tile_m = (base_tile[:, None] + ty * gx + tx).astype(jnp.uint32)
    keys = jnp.where(live, (tile_m << 16) | depth16[:, None],
                     jnp.uint32(INVALID_KEY)).reshape(-1)
    vals = jnp.where(live, splat_ids[:, None], 0).reshape(-1)

    def _dense_emit(idx, alive, width, pos0):
        """Compacted splat ids (C,) + live mask -> dense (C, width) pair
        emission over each splat's full row-major rect (same addressing as
        the base matrix; width >= the splat's num_tiles by construction).
        pos0: emission position of this group's first pair (for the
        buffer-overflow mask above)."""
        rect_c = rect[idx]
        nt_c = jnp.where(alive, num_tiles[idx], 0)
        w_c = jnp.maximum(rect_c[:, 2] - rect_c[:, 0], 1)
        base_c = rect_c[:, 1] * gx + rect_c[:, 0]
        d_c = depth16[idx]
        off_c = jnp.cumsum(nt_c) - nt_c
        ttc = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], width), 1)
        tyc = ttc // w_c[:, None]
        txc = ttc - tyc * w_c[:, None]
        tile_c = (base_c[:, None] + tyc * gx + txc).astype(jnp.uint32)
        live_c = (ttc < nt_c[:, None]) & (pos0 + off_c[:, None] + ttc < k_max)
        key_c = jnp.where(live_c, (tile_c << 16) | d_c[:, None],
                          jnp.uint32(INVALID_KEY)).reshape(-1)
        val_c = jnp.where(live_c, idx[:, None], 0).reshape(-1)
        return key_c, val_c, jnp.sum(nt_c)

    total_extra = jnp.int32(0)
    for (w_t, cap_t, taken, trank) in tier_taken:
        tdest = jnp.where(taken, trank, cap_t)
        tidx = jnp.zeros((cap_t,), jnp.int32).at[tdest].set(
            splat_ids, mode="drop", unique_indices=True)
        talive = jnp.zeros((cap_t,), bool).at[tdest].set(
            taken, mode="drop", unique_indices=True)
        key_t, val_t, n_t = _dense_emit(tidx, talive, w_t,
                                        total + total_extra)
        keys = jnp.concatenate([keys, key_t])
        vals = jnp.concatenate([vals, val_t])
        total_extra = total_extra + n_t

    if gcap:
        # --- dense giant emission ------------------------------------------
        # Compact the taken giants into `gcap` slots, then emit every tile
        # of each giant's rect with one vectorized (gcap, T) key build,
        # appended after the capped pairs. (Pre-sort buffer position only
        # affects equal-(tile,depth16) tie order, which is inside the
        # reference's own race-nondeterminism envelope.)
        gdest = jnp.where(g_taken, grank, gcap)
        gidx = jnp.zeros((gcap,), jnp.int32).at[gdest].set(
            splat_ids, mode="drop", unique_indices=True)
        galive = jnp.zeros((gcap,), bool).at[gdest].set(
            g_taken, mode="drop", unique_indices=True)
        key_g, val_g, n_g = _dense_emit(gidx, galive, cfg.num_tiles,
                                        total + total_extra)
        keys = jnp.concatenate([keys, key_g])
        vals = jnp.concatenate([vals, val_g])
        total_extra = total_extra + n_g
    total = total + total_extra
    overflow = jnp.sum(num_tiles) - total

    skeys, svals = jax.lax.sort_key_val(keys, vals, is_stable=True)
    # Keep the caller-visible buffer at the reference's k_max (10N default,
    # gaussian_splatting_rasterizer.gd:79): valid pairs sort to the front,
    # so when total <= k_max this slice is exactly the old buffer; beyond
    # it pairs drop (the reference's overflow is out-of-bounds UB there).
    if skeys.shape[0] > k_max:
        skeys, svals = skeys[:k_max], svals[:k_max]
    elif skeys.shape[0] < k_max:
        skeys = jnp.concatenate([skeys, jnp.full(
            (k_max - skeys.shape[0],), INVALID_KEY, jnp.uint32)])
        svals = jnp.concatenate([svals, jnp.zeros(
            (k_max - svals.shape[0],), svals.dtype)])
    return SortedPairs(keys=skeys, values=svals,
                       num_pairs=total.astype(jnp.int32),
                       num_overflow=overflow.astype(jnp.int32))


def tile_boundaries(
    sorted_keys: jnp.ndarray,   # (K_max,) u32
    num_pairs: jnp.ndarray,     # () i32
    cfg: RasterizerConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tile [start, end) ranges over the sorted pair buffer.

    Semantically equivalent to gsplat_boundaries.glsl's adjacent-key compare,
    implemented as two vectorized binary searches per tile (the sorted tile ids
    are monotone, so searchsorted *is* the boundary extraction).

    Reproduces the reference's two quirks when cfg.reference_boundary_quirk
    (gsplat_boundaries.glsl:36-49):
      * the final run in the buffer never gets an end written, so the
        highest-present-tile's range collapses to empty — unless it is the
        bottom-right grid tile, whose end is patched to num_pairs-1
        (dropping that tile's farthest splat).
    Returns (start, end) each (num_tiles,) i32, end clamped ≥ start.
    """
    T = cfg.num_tiles
    tids = (sorted_keys >> 16).astype(jnp.int32)  # INVALID_KEY → 0xFFFF ≥ T
    # Restrict the search to the valid region by overwriting the tail with a
    # sentinel ≥ T (padding already satisfies this; num_pairs only matters for
    # the quirk below).
    queries = jnp.arange(T, dtype=jnp.int32)
    start = jnp.searchsorted(tids, queries, side="left").astype(jnp.int32)
    end = jnp.searchsorted(tids, queries, side="right").astype(jnp.int32)

    if cfg.reference_boundary_quirk:
        n = num_pairs
        has_pairs = n > 0
        last_tid = jnp.where(has_pairs, tids[jnp.maximum(n - 1, 0)], -1)
        is_grid_last = last_tid == (T - 1)
        # Final-run end: dropped entirely, unless it's the last grid tile,
        # which gets end = n-1 (one splat short). Guard: the fixup thread only
        # runs for ids in [1, n), so a single-pair buffer (n == 1) never fixes
        # up either (id 0 returns early, gsplat_boundaries.glsl:27).
        patched_end = jnp.where(is_grid_last & (n > 1), n - 1, 0)
        end = jnp.where(
            (queries == last_tid) & has_pairs,
            patched_end,
            end,
        )
    end = jnp.maximum(end, start)  # render's max(0, end-start) (gsplat_render.glsl:61)
    return start, end
