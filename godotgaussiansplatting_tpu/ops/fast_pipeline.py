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
    bf: BlockFrame = build_block_frame(prj, cfg)
    bins: TileBins = bin_blocks(bf, cfg, supertile_cap=supertile_cap,
                                tile_cap=tile_cap)
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
