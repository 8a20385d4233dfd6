"""The TPU fast path: projection → block build v2 → binning v2 → Pallas v2.

This is the performance pipeline behind RasterizerConfig.quality="fast";
"exact" (ops/pipeline.py) remains the semantics oracle. See ops/blocks2.py
and ops/render_pallas2.py for the design and the ordering-semantics
statement (intra-block exact depth order; adjacent-block interleaving exact
via lag-1 depth masks; residual deviation only for interleavings that skip
a list position and equal-depth16 ties).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterizerConfig
from ..models.splats import SplatCloud
from .blocks2 import BLOCK_SIZE, DEPTH_INVALID, BlockFrame2, build_block_frame2
from .binning2 import TileBins2, bin_blocks2
from .pipeline import FrameStats, FrameUniforms
from .projection import project_splats
from .render_pallas2 import assemble_image_v2, render_tiles_v2


class FastFrameOutput(NamedTuple):
    image: jnp.ndarray          # (H, W, 4) f32
    stats: FrameStats
    # picking state (device-resident):
    tile_blocks: jnp.ndarray    # (T, C2) i32
    tile_nblocks: jnp.ndarray   # (T,) i32
    tile_t0: jnp.ndarray        # (T,) f32 — pixel (0,0) transmittance per tile
    payload: jnp.ndarray        # (B, 16, S) f32 block payload (depth+idx rows)


def render_frame_fast(
    cloud: SplatCloud,
    uniforms: FrameUniforms,
    cfg: RasterizerConfig,
    supertile_cap: int = 1024,
    tile_cap: int = 256,
    early_exit: bool = True,
    chain: str = "mm_bf16",
    xmask: bool = True,
    interpret: bool = False,
) -> FastFrameOutput:
    prj = project_splats(
        cloud.means, cloud.cov3d, cloud.opacity, cloud.sh, cloud.upload_time,
        uniforms.view, uniforms.proj, uniforms.camera_pos,
        uniforms.model_scale, uniforms.time, cfg,
    )
    # Stage barriers: without them XLA tries to fuse the whole frame into one
    # scheduling problem and compile time explodes at multi-million-splat
    # shapes (>15 min vs ~3 min split; no measurable runtime cost).
    prj = type(prj)(*jax.lax.optimization_barrier(tuple(prj)))
    bf: BlockFrame2 = build_block_frame2(prj, cfg,
                                         num_splats=cloud.num_splats)
    bf = type(bf)(*jax.lax.optimization_barrier(tuple(bf)))
    bins: TileBins2 = bin_blocks2(bf, cfg, supertile_cap=supertile_cap,
                                  tile_cap=tile_cap)
    bins = type(bins)(*jax.lax.optimization_barrier(tuple(bins)))
    tiles = render_tiles_v2(
        bf.payload, bins, uniforms.heatmap_factor, cfg,
        early_exit=early_exit, chain=chain, xmask=xmask, interpret=interpret)
    image, t_final = assemble_image_v2(tiles, cfg)
    stats = FrameStats(
        num_pairs=bf.num_culled_pairs,
        num_overflow=bins.overflow,
        max_tile_count=jnp.max(bins.tile_candidates),
    )
    return FastFrameOutput(
        image=image, stats=stats,
        tile_blocks=bins.tile_blocks, tile_nblocks=bins.tile_nblocks,
        tile_t0=t_final[:, 0], payload=bf.payload,
    )


@functools.partial(jax.jit, static_argnames=(
    "cfg", "supertile_cap", "tile_cap", "early_exit", "chain", "xmask",
    "interpret"))
def render_frame_fast_jit(cloud, uniforms, cfg, supertile_cap=1024,
                          tile_cap=256, early_exit=True, chain="mm_bf16",
                          xmask=True, interpret=False):
    return render_frame_fast(cloud, uniforms, cfg, supertile_cap, tile_cap,
                             early_exit, chain, xmask, interpret)


# --- staged variant -----------------------------------------------------
# Four chained stage jits compile faster than one whole-frame program at
# multi-million-splat shapes and dispatch asynchronously back-to-back, so
# the frame still runs device-side without host round-trips between stages.
# They also give the engine per-stage timing hooks (utils/telemetry.py).

@functools.partial(jax.jit, static_argnames=("cfg",))
def _stage_project(cloud, uniforms, cfg):
    return project_splats(
        cloud.means, cloud.cov3d, cloud.opacity, cloud.sh, cloud.upload_time,
        uniforms.view, uniforms.proj, uniforms.camera_pos,
        uniforms.model_scale, uniforms.time, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "num_splats"))
def _stage_blocks(prj, cfg, num_splats=None):
    return build_block_frame2(prj, cfg, num_splats=num_splats)


@functools.partial(jax.jit, static_argnames=("cfg", "supertile_cap",
                                             "tile_cap"))
def _stage_bin(bf, cfg, supertile_cap, tile_cap):
    return bin_blocks2(bf, cfg, supertile_cap=supertile_cap,
                       tile_cap=tile_cap)


@functools.partial(jax.jit, static_argnames=("cfg", "early_exit", "chain",
                                             "xmask"))
def _stage_render(bf, bins, heatmap_factor, cfg, early_exit, chain, xmask):
    tiles = render_tiles_v2(bf.payload, bins, heatmap_factor, cfg,
                            early_exit=early_exit, chain=chain, xmask=xmask)
    image, t_final = assemble_image_v2(tiles, cfg)
    stats = FrameStats(
        num_pairs=bf.num_culled_pairs,
        num_overflow=bins.overflow,
        max_tile_count=jnp.max(bins.tile_candidates))
    return image, t_final, stats


def render_frame_fast_staged(cloud, uniforms, cfg, supertile_cap=1024,
                             tile_cap=256, early_exit=True, chain="mm_bf16",
                             xmask=True,
                             stage_timer=None) -> FastFrameOutput:
    """Staged frame; with stage_timer (utils/telemetry.stage_timer-style
    context factory) each stage is individually timed."""
    if stage_timer is None:
        prj = _stage_project(cloud, uniforms, cfg)
        bf = _stage_blocks(prj, cfg, cloud.num_splats)
        bins = _stage_bin(bf, cfg, supertile_cap, tile_cap)
        image, t_final, stats = _stage_render(
            bf, bins, uniforms.heatmap_factor, cfg, early_exit, chain, xmask)
    else:
        with stage_timer("Projection", lambda: prj.depth16):
            prj = _stage_project(cloud, uniforms, cfg)
        with stage_timer("Blocks", lambda: bf.min_depth):
            bf = _stage_blocks(prj, cfg, cloud.num_splats)
        with stage_timer("Binning", lambda: bins.tile_nblocks):
            bins = _stage_bin(bf, cfg, supertile_cap, tile_cap)
        with stage_timer("Render", lambda: image):
            image, t_final, stats = _stage_render(
                bf, bins, uniforms.heatmap_factor, cfg, early_exit, chain,
                xmask)
    return FastFrameOutput(
        image=image, stats=stats,
        tile_blocks=bins.tile_blocks, tile_nblocks=bins.tile_nblocks,
        tile_t0=t_final[:, 0], payload=bf.payload)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _pick_fast(frame: FastFrameOutput, tile_id, means, model_scale, cfg):
    """The reference picks the splat 10% into the tile's globally
    depth-sorted covered range (gsplat_render.glsl:103-110). The v2 payload
    carries depth + source index rows, so this is reproduced exactly: gather
    the tile's covering blocks, mask to members whose radius-rect covers the
    tile, take the (n/10)-th smallest depth, return its world position."""
    S = BLOCK_SIZE
    gx, _ = cfg.tile_dims
    ts = float(cfg.tile_size)
    ids = frame.tile_blocks[tile_id]                        # (C2,)
    entry_ok = ids >= 0
    pays = frame.payload[jnp.maximum(ids, 0)]               # (C2, 16, S)
    ix, iy, rad = pays[:, 9], pays[:, 10], pays[:, 11]
    depth = pays[:, 12]
    idx = jax.lax.bitcast_convert_type(pays[:, 13], jnp.uint32)
    tx = (tile_id % gx).astype(jnp.float32) * ts
    ty = (tile_id // gx).astype(jnp.float32) * ts
    covered = ((ix - rad < tx + ts) & (ix + rad > tx)
               & (iy - rad < ty + ts) & (iy + rad > ty)
               & (depth < DEPTH_INVALID) & entry_ok[:, None])
    key = jnp.where(covered, depth, DEPTH_INVALID).reshape(-1)
    skey, sidx = jax.lax.sort_key_val(key, idx.reshape(-1))
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
