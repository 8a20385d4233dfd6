"""The TPU fast path: projection → block build v2 → binning v2 → Pallas v3.

This is the performance pipeline behind RasterizerConfig.quality="fast";
"exact" (ops/pipeline.py) remains the semantics oracle. See ops/blocks2.py
and ops/render_pallas3.py for the design and the ordering-semantics
statement (exact depth interleaving within ±1 batch of 4 blocks; big-splat
outlier blocks exactly interleaved regardless of depth extent; residual
deviation only for chain blocks ≥2 batches apart with overlapping depth
ranges and equal-depth16 ties).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterizerConfig
from ..models.splats import SplatCloud
from .bigbin import TileBigs, bin_bigs
from .blocks2 import (BLOCK_SIZE, DEPTH_INVALID, BlockFrame2,
                      build_block_frame2, build_block_frame2_words)
from .binning2 import TileBins2, bin_blocks2
from .pipeline import FrameStats, FrameUniforms
from .projection import project_splats
from .projection_pallas import project_words
from .render_pallas3 import assemble_image_v3, render_tiles_v3


def _slim_projection(prj):
    """Drop ProjectedSplats fields the fast path never reads (per-splat
    tile rect and square radius — blocks2 rebuilds anisotropic extents from
    the carried conic/opacity): the stage barrier would otherwise force
    ~116 MB/frame of dead materialization at the 5.8M headline. The exact
    pipeline (ops/pipeline.py) keeps the full structure."""
    return prj._replace(
        rect=jnp.zeros((1, 4), prj.rect.dtype),
        radius=jnp.zeros((1,), prj.radius.dtype))


class FastFrameOutput(NamedTuple):
    image: jnp.ndarray          # (4, H, W) f32 PLANAR render target (see
                                # assemble_image_v3; utils/image.hwc gives
                                # hosts the (H, W, 4) view for free)
    stats: FrameStats
    # picking state (device-resident):
    tile_blocks: jnp.ndarray    # (T, C2) i32
    tile_nblocks: jnp.ndarray   # (T,) i32
    tile_t0: jnp.ndarray        # (T,) f32 — pixel (0,0) transmittance per tile
    payload: jnp.ndarray        # (B, 16, S) f32 block payload (depth+idx rows)
    tile_bigpay: jnp.ndarray    # (T, 16, OBIG) f32 per-tile big-lane payload
    tile_nbig: jnp.ndarray      # (T,) i32


def render_frame_fast(
    cloud: SplatCloud,
    uniforms: FrameUniforms,
    cfg: RasterizerConfig,
    supertile_cap: int = 1024,
    tile_cap: int = 256,
    early_exit: bool = True,
    lowp: bool = True,
    obig: int | None = None,
    interpret: bool = False,
    batch_u: int | None = None,
) -> FastFrameOutput:
    if cfg.projection_kernel:
        words = project_words(
            cloud.means, cloud.cov3d, cloud.opacity, cloud.sh,
            cloud.upload_time, uniforms.view, uniforms.proj,
            uniforms.camera_pos, uniforms.model_scale, uniforms.time, cfg,
            num_splats=cloud.num_splats, interpret=interpret)
        words = type(words)(*jax.lax.optimization_barrier(tuple(words)))
        bf, bigs = build_block_frame2_words(words, cfg,
                                            words_payload=cfg.words_payload,
                                            big_cap=cfg.big_capacity)
    else:
        prj = project_splats(
            cloud.means, cloud.cov3d, cloud.opacity, cloud.sh,
            cloud.upload_time, uniforms.view, uniforms.proj,
            uniforms.camera_pos, uniforms.model_scale, uniforms.time, cfg,
        )
        # Stage barriers: without them XLA tries to fuse the whole frame
        # into one scheduling problem and compile time explodes at
        # multi-million-splat shapes (>15 min vs ~3 min split; no
        # measurable runtime cost).
        prj = _slim_projection(prj)
        prj = type(prj)(*jax.lax.optimization_barrier(tuple(prj)))
        bf, bigs = build_block_frame2(prj, cfg, num_splats=cloud.num_splats,
                                      words_payload=cfg.words_payload,
                                      big_cap=cfg.big_capacity)
    bf = type(bf)(*jax.lax.optimization_barrier(tuple(bf)))
    bigs = type(bigs)(*jax.lax.optimization_barrier(tuple(bigs)))
    bins: TileBins2 = bin_blocks2(bf, cfg, supertile_cap=supertile_cap,
                                  tile_cap=tile_cap)
    tile_bigs: TileBigs = bin_bigs(bigs, cfg,
                                   obig=obig or cfg.big_tile_capacity)
    bins = type(bins)(*jax.lax.optimization_barrier(tuple(bins)))
    tile_bigs = type(tile_bigs)(*jax.lax.optimization_barrier(
        tuple(tile_bigs)))
    if cfg.kernel == "v4":
        if cfg.words_payload:
            raise ValueError(
                "words_payload is a v3-kernel feature (the lockstep v4 "
                "kernel still reads the cooked 16-row payload)")
        from .render_pallas4 import assemble_image_v4, render_tiles_v4
        tiles = render_tiles_v4(
            bf.payload, bins, tile_bigs, uniforms.heatmap_factor, cfg,
            early_exit=early_exit, lowp=lowp, interpret=interpret,
            batch_u=batch_u)
        image, t_final = assemble_image_v4(tiles, cfg)
    else:
        tiles = render_tiles_v3(
            bf.payload, bins, tile_bigs, uniforms.heatmap_factor, cfg,
            early_exit=early_exit, lowp=lowp, interpret=interpret,
            batch_u=batch_u)
        image, t_final = assemble_image_v3(tiles, cfg)
    stats = FrameStats(
        num_pairs=bf.num_culled_pairs,
        num_overflow=bins.overflow + tile_bigs.overflow,
        max_tile_count=jnp.max(bins.tile_candidates),
    )
    return FastFrameOutput(
        image=image, stats=stats,
        tile_blocks=bins.tile_blocks, tile_nblocks=bins.tile_nblocks,
        tile_t0=t_final[:, 0], payload=bf.payload,
        tile_bigpay=tile_bigs.bigpay, tile_nbig=tile_bigs.tile_nbig,
    )


@functools.partial(jax.jit, static_argnames=(
    "cfg", "supertile_cap", "tile_cap", "early_exit", "lowp", "obig",
    "interpret"))
def render_frame_fast_jit(cloud, uniforms, cfg, supertile_cap=1024,
                          tile_cap=256, early_exit=True, lowp=True,
                          obig=None, interpret=False):
    return render_frame_fast(cloud, uniforms, cfg, supertile_cap, tile_cap,
                             early_exit, lowp, obig, interpret)


# --- staged variant -----------------------------------------------------
# Four chained stage jits compile faster than one whole-frame program at
# multi-million-splat shapes and dispatch asynchronously back-to-back, so
# the frame still runs device-side without host round-trips between stages.
# They also give the engine per-stage timing hooks (utils/telemetry.py).

@functools.partial(jax.jit, static_argnames=("cfg", "num_splats"))
def _stage_project(cloud, uniforms, cfg, num_splats=None):
    if cfg.projection_kernel:
        return project_words(
            cloud.means, cloud.cov3d, cloud.opacity, cloud.sh,
            cloud.upload_time, uniforms.view, uniforms.proj,
            uniforms.camera_pos, uniforms.model_scale, uniforms.time, cfg,
            num_splats=num_splats)
    return _slim_projection(project_splats(
        cloud.means, cloud.cov3d, cloud.opacity, cloud.sh, cloud.upload_time,
        uniforms.view, uniforms.proj, uniforms.camera_pos,
        uniforms.model_scale, uniforms.time, cfg))


@functools.partial(jax.jit, static_argnames=("cfg", "num_splats"))
def _stage_blocks(prj, cfg, num_splats=None):
    if cfg.projection_kernel:
        return build_block_frame2_words(prj, cfg, big_cap=cfg.big_capacity,
                                        words_payload=cfg.words_payload)
    return build_block_frame2(prj, cfg, num_splats=num_splats,
                              words_payload=cfg.words_payload,
                              big_cap=cfg.big_capacity)


@functools.partial(jax.jit, static_argnames=("cfg", "supertile_cap",
                                             "tile_cap", "obig"))
def _stage_bin(bf, bigs, cfg, supertile_cap, tile_cap, obig):
    return (bin_blocks2(bf, cfg, supertile_cap=supertile_cap,
                        tile_cap=tile_cap),
            bin_bigs(bigs, cfg, obig=obig or cfg.big_tile_capacity))


@functools.partial(jax.jit, static_argnames=("cfg", "early_exit", "lowp"))
def _stage_render(bf, bins, tile_bigs, heatmap_factor, cfg, early_exit,
                  lowp):
    if cfg.kernel == "v4":
        if cfg.words_payload:
            raise ValueError(
                "words_payload is a v3-kernel feature (the lockstep v4 "
                "kernel still reads the cooked 16-row payload)")
        from .render_pallas4 import assemble_image_v4, render_tiles_v4
        tiles = render_tiles_v4(bf.payload, bins, tile_bigs,
                                heatmap_factor, cfg,
                                early_exit=early_exit, lowp=lowp)
        image, t_final = assemble_image_v4(tiles, cfg)
    else:
        tiles = render_tiles_v3(bf.payload, bins, tile_bigs,
                                heatmap_factor, cfg,
                                early_exit=early_exit, lowp=lowp)
        image, t_final = assemble_image_v3(tiles, cfg)
    stats = FrameStats(
        num_pairs=bf.num_culled_pairs,
        num_overflow=bins.overflow + tile_bigs.overflow,
        max_tile_count=jnp.max(bins.tile_candidates))
    return image, t_final, stats


def render_frame_fast_staged(cloud, uniforms, cfg, supertile_cap=1024,
                             tile_cap=256, early_exit=True, lowp=True,
                             obig=None, stage_timer=None) -> FastFrameOutput:
    """Staged frame; with stage_timer (utils/telemetry.stage_timer-style
    context factory) each stage is individually timed."""
    if stage_timer is None:
        prj = _stage_project(cloud, uniforms, cfg, cloud.num_splats)
        bf, bigs = _stage_blocks(prj, cfg, cloud.num_splats)
        bins, tile_bigs = _stage_bin(bf, bigs, cfg, supertile_cap, tile_cap,
                                     obig)
        image, t_final, stats = _stage_render(
            bf, bins, tile_bigs, uniforms.heatmap_factor, cfg, early_exit,
            lowp)
    else:
        with stage_timer("Projection", lambda: jax.tree.leaves(prj)[0]):
            prj = _stage_project(cloud, uniforms, cfg, cloud.num_splats)
        with stage_timer("Blocks", lambda: bf.min_depth):
            bf, bigs = _stage_blocks(prj, cfg, cloud.num_splats)
        with stage_timer("Binning", lambda: bins.tile_nblocks):
            bins, tile_bigs = _stage_bin(bf, bigs, cfg, supertile_cap,
                                         tile_cap, obig)
        with stage_timer("Render", lambda: image):
            image, t_final, stats = _stage_render(
                bf, bins, tile_bigs, uniforms.heatmap_factor, cfg,
                early_exit, lowp)
    return FastFrameOutput(
        image=image, stats=stats,
        tile_blocks=bins.tile_blocks, tile_nblocks=bins.tile_nblocks,
        tile_t0=t_final[:, 0], payload=bf.payload,
        tile_bigpay=tile_bigs.bigpay, tile_nbig=tile_bigs.tile_nbig)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _pick_fast(frame: FastFrameOutput, tile_id, means, model_scale, cfg):
    """The reference picks the splat 10% into the tile's globally
    depth-sorted covered range (gsplat_render.glsl:103-110). The payload
    carries depth + source index rows (chain blocks and the per-tile big
    lanes), so this is reproduced exactly: gather the tile's covering
    lanes, mask to members whose radius-rect covers the tile, take the
    (n/10)-th smallest depth, return its world position."""
    S = BLOCK_SIZE
    gx, _ = cfg.tile_dims
    ts = float(cfg.tile_size)
    entries = frame.tile_blocks[tile_id]                    # (C2,)
    entry_ok = entries >= 0
    ids = jnp.where(entry_ok, entries & 0x7FFFFF, 0)
    pays = frame.payload[ids]                               # (C2, 16, S)
    # big lanes are binned per GROUP of tiles (GROUP=1 today, ops/bigbin.py);
    # the per-lane coverage test below scopes them to this tile regardless
    from .bigbin import GROUP
    gx2 = -(-gx // GROUP)
    gid = (tile_id // gx) * gx2 + (tile_id % gx) // GROUP
    bigp = frame.tile_bigpay[gid]                           # (16, OBIG)
    if frame.payload.dtype == jnp.uint32:
        # words payload (cfg.words_payload): [key, ix, iy, pc1, pc2, rgb9,
        # idx, rx|ry] u32 rows — same quantities, different homes
        f32b = lambda w: jax.lax.bitcast_convert_type(  # noqa: E731
            w, jnp.float32)
        ix_c = f32b(pays[:, 1].reshape(-1))
        iy_c = f32b(pays[:, 2].reshape(-1))
        rw_c = pays[:, 7].reshape(-1)
        d_chain = (pays[:, 0].reshape(-1) & 0xFFFF).astype(jnp.float32)
        idx_c = pays[:, 6].reshape(-1)
    else:
        ix_c = pays[:, 9].reshape(-1)
        iy_c = pays[:, 10].reshape(-1)
        rw_c = jax.lax.bitcast_convert_type(pays[:, 11].reshape(-1),
                                            jnp.uint32)
        # chain row 12 is the packed order rank (ops/blocks2.py layout)
        wch = jax.lax.bitcast_convert_type(
            pays[:, 12].reshape(-1), jnp.uint32) ^ jnp.uint32(0x80000000)
        d_chain = (wch >> 16).astype(jnp.float32)
        idx_c = jax.lax.bitcast_convert_type(pays[:, 13].reshape(-1),
                                             jnp.uint32)
    ix = jnp.concatenate([ix_c, bigp[9]])
    iy = jnp.concatenate([iy_c, bigp[10]])
    rw = jnp.concatenate(
        [rw_c, jax.lax.bitcast_convert_type(bigp[11], jnp.uint32)])
    rx = jax.lax.bitcast_convert_type(
        (rw & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    ry = jax.lax.bitcast_convert_type(
        (rw >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32)
    # big tables keep plain depth16-as-f32; decode both to f32 depth16 with
    # 0xFFFF as the invalid sentinel.
    d_chain = jnp.where(d_chain >= 65535.0, DEPTH_INVALID, d_chain)
    d_big = jnp.where(bigp[12] >= 65535.0, DEPTH_INVALID, bigp[12])
    depth = jnp.concatenate([d_chain, d_big])
    idx = jnp.concatenate(
        [idx_c, jax.lax.bitcast_convert_type(bigp[13], jnp.uint32)])
    lane_ok = jnp.concatenate([
        jnp.broadcast_to(entry_ok[:, None], pays[:, 0].shape).reshape(-1),
        jnp.ones((bigp.shape[1],), bool)])
    tx = (tile_id % gx).astype(jnp.float32) * ts
    ty = (tile_id // gx).astype(jnp.float32) * ts
    covered = ((ix - rx < tx + ts) & (ix + rx > tx)
               & (iy - ry < ty + ts) & (iy + ry > ty)
               & (depth < DEPTH_INVALID) & lane_ok)
    key = jnp.where(covered, depth, DEPTH_INVALID)
    skey, sidx = jax.lax.sort_key_val(key, idx)
    n = jnp.sum(covered)
    k = jnp.clip(n // 10, 0, skey.shape[0] - 1)
    pos = means[sidx[k]] * model_scale
    hit = (n > 0) & (frame.tile_t0[tile_id] != 1.0)
    return jnp.where(hit, pos, jnp.inf)


def pick_splat_position_fast(frame: FastFrameOutput, tile_id,
                             cloud: SplatCloud, model_scale,
                             cfg: RasterizerConfig) -> jnp.ndarray:
    """Fast-path picking; returns PLY-frame position or +inf."""
    return _pick_fast(frame, jnp.int32(tile_id), cloud.means,
                      jnp.float32(model_scale), cfg)
