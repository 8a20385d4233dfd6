"""The TPU fast path: block-hierarchical frame (projection → block sort →
binning → Pallas render).

This is the performance pipeline behind RasterizerConfig.quality="fast";
"exact" (ops/pipeline.py) remains the semantics oracle. See ops/blocks.py for
the design rationale and the ordering-semantics statement.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterizerConfig
from ..models.splats import SplatCloud
from .blocks import BLOCK_SIZE, BlockFrame, build_block_frame
from .binning import TileBins, bin_blocks
from .pipeline import FrameStats, FrameUniforms
from .projection import project_splats
from .render_pallas import assemble_image, render_tiles_pallas


class FastFrameOutput(NamedTuple):
    image: jnp.ndarray          # (H, W, 4) f32
    stats: FrameStats
    # picking state (device-resident):
    tile_blocks: jnp.ndarray    # (T, C2) i32
    tile_nblocks: jnp.ndarray   # (T,) i32
    tile_t0: jnp.ndarray        # (T,) f32 — pixel (0,0) transmittance per tile
    block_pos: jnp.ndarray      # (B, 3, S) f32 world positions (depth order)
    block_nvalid: jnp.ndarray   # (B,) i32


def render_frame_fast(
    cloud: SplatCloud,
    uniforms: FrameUniforms,
    cfg: RasterizerConfig,
    supertile_cap: int = 1024,
    tile_cap: int = 256,
    early_exit: bool = True,
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
    bf: BlockFrame = build_block_frame(prj, cfg)
    bf = type(bf)(*jax.lax.optimization_barrier(tuple(bf)))
    bins: TileBins = bin_blocks(bf, cfg, supertile_cap=supertile_cap,
                                tile_cap=tile_cap)
    bins = type(bins)(*jax.lax.optimization_barrier(tuple(bins)))
    tiles = render_tiles_pallas(
        bf.payload, bins.tile_blocks, bins.tile_nblocks, bins.tile_candidates,
        uniforms.heatmap_factor, cfg, early_exit=early_exit,
        interpret=interpret)
    image, t_final = assemble_image(tiles, cfg)
    stats = FrameStats(
        num_pairs=bf.num_culled_pairs,
        num_overflow=bins.overflow,
        max_tile_count=jnp.max(bins.tile_candidates),
    )
    return FastFrameOutput(
        image=image, stats=stats,
        tile_blocks=bins.tile_blocks, tile_nblocks=bins.tile_nblocks,
        tile_t0=t_final[:, 0], block_pos=bf.pos, block_nvalid=bf.num_valid,
    )


@functools.partial(jax.jit, static_argnames=(
    "cfg", "supertile_cap", "tile_cap", "early_exit", "interpret"))
def render_frame_fast_jit(cloud, uniforms, cfg, supertile_cap=1024,
                          tile_cap=256, early_exit=True, interpret=False):
    return render_frame_fast(cloud, uniforms, cfg, supertile_cap, tile_cap,
                             early_exit, interpret)


# --- staged variant -----------------------------------------------------
# One whole-frame jit makes XLA's scheduling blow up at multi-million-splat
# shapes (compile >15 min, and the program ships through a remote-compile
# tunnel in this environment). Four chained stage jits compile in ~3 min
# total and dispatch asynchronously back-to-back, so the frame still runs
# device-side without host round-trips between stages.

@functools.partial(jax.jit, static_argnames=("cfg",))
def _stage_project(cloud, uniforms, cfg):
    return project_splats(
        cloud.means, cloud.cov3d, cloud.opacity, cloud.sh, cloud.upload_time,
        uniforms.view, uniforms.proj, uniforms.camera_pos,
        uniforms.model_scale, uniforms.time, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _stage_blocks(prj, cfg):
    return build_block_frame(prj, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "supertile_cap",
                                             "tile_cap"))
def _stage_bin(bf, cfg, supertile_cap, tile_cap):
    return bin_blocks(bf, cfg, supertile_cap=supertile_cap,
                      tile_cap=tile_cap)


@functools.partial(jax.jit, static_argnames=("cfg", "early_exit"))
def _stage_render(bf, bins, heatmap_factor, cfg, early_exit):
    tiles = render_tiles_pallas(
        bf.payload, bins.tile_blocks, bins.tile_nblocks, bins.tile_candidates,
        heatmap_factor, cfg, early_exit=early_exit)
    image, t_final = assemble_image(tiles, cfg)
    stats = FrameStats(
        num_pairs=bf.num_culled_pairs,
        num_overflow=bins.overflow,
        max_tile_count=jnp.max(bins.tile_candidates))
    return image, t_final, stats


def render_frame_fast_staged(cloud, uniforms, cfg, supertile_cap=1024,
                             tile_cap=256, early_exit=True) -> FastFrameOutput:
    prj = _stage_project(cloud, uniforms, cfg)
    bf = _stage_blocks(prj, cfg)
    bins = _stage_bin(bf, cfg, supertile_cap, tile_cap)
    image, t_final, stats = _stage_render(bf, bins, uniforms.heatmap_factor,
                                          cfg, early_exit)
    return FastFrameOutput(
        image=image, stats=stats,
        tile_blocks=bins.tile_blocks, tile_nblocks=bins.tile_nblocks,
        tile_t0=t_final[:, 0], block_pos=bf.pos, block_nvalid=bf.num_valid)


def pick_splat_position_fast(frame: FastFrameOutput, tile_id) -> jnp.ndarray:
    """Fast-path picking: the splat ~10% into the tile's front-to-back block
    list (the analogue of gsplat_render.glsl:103-110's `bounds.x + n/10`).
    Returns PLY-frame position or +inf."""
    nb = frame.tile_nblocks[tile_id]
    # 10% into the block list, then 10% into that block's valid members.
    bsel = frame.tile_blocks[tile_id, jnp.clip(nb // 10, 0, None)]
    nv = frame.block_nvalid[bsel]
    pos = frame.block_pos[bsel, :, jnp.clip(nv // 10, 0, BLOCK_SIZE - 1)]
    hit = (nb > 0) & (nv > 0) & (frame.tile_t0[tile_id] != 1.0)
    return jnp.where(hit, pos, jnp.inf)
