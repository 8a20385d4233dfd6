"""The full four-stage frame: projection → sort → boundaries → render.

Equivalent of `GaussianSplattingRasterizer.rasterize`
(gaussian_splatting_rasterizer.gd:122-160) as a single jit-compiled,
device-resident program: no host round-trips between stages, no barriers
(XLA's dataflow is the barrier), camera matrices arrive as traced arrays
(the push-constant/uniform analogue, double-buffered by dispatch pipelining).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterizerConfig
from ..models.splats import SplatCloud
from .projection import project_splats
from .render import RenderOutput, render_tiles
from .sort import emit_and_sort, tile_boundaries


class FrameUniforms(NamedTuple):
    """Traced per-frame state (the uniforms + push constants of the reference,
    gaussian_splatting_rasterizer.gd:125-126, 181-193)."""

    view: jnp.ndarray          # (4, 4)
    proj: jnp.ndarray          # (4, 4)
    camera_pos: jnp.ndarray    # (3,) PLY frame
    model_scale: jnp.ndarray   # () f32 (main.gd:52 slider)
    time: jnp.ndarray          # () f32 seconds (fade-in clock)
    heatmap_factor: jnp.ndarray  # () f32 0/1 (main.gd:50)


def make_uniforms(camera, cfg: RasterizerConfig, model_scale: float = 1.0,
                  time: float = 1e9, heatmap: float = 0.0) -> FrameUniforms:
    """Build per-frame uniforms from a models.camera.Camera (host-side; the
    analogue of update_camera_matrices + the uniform buffer update,
    gaussian_splatting_rasterizer.gd:125-126,175-195)."""
    w, h = cfg.target_size
    return FrameUniforms(
        view=jnp.asarray(camera.view_matrix()),
        proj=jnp.asarray(camera.projection_matrix(w, h)),
        camera_pos=jnp.asarray(camera.camera_pos_ply()),
        model_scale=jnp.float32(model_scale),
        time=jnp.float32(time),
        heatmap_factor=jnp.float32(heatmap),
    )


class FrameStats(NamedTuple):
    num_pairs: jnp.ndarray     # () i32 — "Rendered Splats" stat (main.gd:98-100)
    num_overflow: jnp.ndarray  # () i32 — pairs dropped by the per-splat cap
    max_tile_count: jnp.ndarray  # () i32 — densest tile (render-cap observability)


class FrameOutput(NamedTuple):
    image: jnp.ndarray         # (H, W, 4) f32
    stats: FrameStats
    # Device-resident intermediates needed by picking (get_splat_position):
    sorted_values: jnp.ndarray
    tile_start: jnp.ndarray
    tile_end: jnp.ndarray
    tile_t0: jnp.ndarray
    splat_pos: jnp.ndarray     # (P, 3) model-scaled positions


def render_frame(
    cloud: SplatCloud,
    uniforms: FrameUniforms,
    cfg: RasterizerConfig,
    tile_capacity: int = 2048,
) -> FrameOutput:
    """One full frame. Static args: cfg, tile_capacity (shape-defining)."""
    prj = project_splats(
        cloud.means, cloud.cov3d, cloud.opacity, cloud.sh, cloud.upload_time,
        uniforms.view, uniforms.proj, uniforms.camera_pos,
        uniforms.model_scale, uniforms.time, cfg,
    )
    pairs = emit_and_sort(prj.valid, prj.rect, prj.num_tiles, prj.depth16, cfg)
    start, end = tile_boundaries(pairs.keys, pairs.num_pairs, cfg)
    out: RenderOutput = render_tiles(
        pairs.values, start, end,
        prj.image_pos, prj.conic, prj.color,
        uniforms.heatmap_factor, cfg, tile_capacity=tile_capacity,
    )
    stats = FrameStats(
        num_pairs=pairs.num_pairs,
        num_overflow=pairs.num_overflow,
        max_tile_count=jnp.max(out.tile_counts),
    )
    return FrameOutput(
        image=out.image, stats=stats,
        sorted_values=pairs.values, tile_start=start, tile_end=end,
        tile_t0=out.tile_t0, splat_pos=prj.pos,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "tile_capacity"))
def render_frame_jit(cloud, uniforms, cfg, tile_capacity=2048):
    return render_frame(cloud, uniforms, cfg, tile_capacity)


# --- staged exact frame (per-stage telemetry, utils/telemetry.py) -----------

@functools.partial(jax.jit, static_argnames=("cfg",))
def _stage_project_x(cloud, uniforms, cfg):
    return project_splats(
        cloud.means, cloud.cov3d, cloud.opacity, cloud.sh, cloud.upload_time,
        uniforms.view, uniforms.proj, uniforms.camera_pos,
        uniforms.model_scale, uniforms.time, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _stage_sort_x(prj, cfg):
    return emit_and_sort(prj.valid, prj.rect, prj.num_tiles, prj.depth16, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _stage_bounds_x(pairs, cfg):
    return tile_boundaries(pairs.keys, pairs.num_pairs, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "tile_capacity"))
def _stage_render_x(pairs, start, end, prj, heatmap_factor, cfg,
                    tile_capacity):
    return render_tiles(pairs.values, start, end, prj.image_pos, prj.conic,
                        prj.color, heatmap_factor, cfg,
                        tile_capacity=tile_capacity)


def render_frame_staged(cloud, uniforms, cfg, tile_capacity=2048,
                        stage_timer=None) -> FrameOutput:
    """The exact frame as four chained stage jits, optionally timed with the
    reference's stage names (gaussian_splatting_rasterizer.gd:135-160)."""
    if stage_timer is None:
        import contextlib

        def stage_timer(name, probe):
            return contextlib.nullcontext()
    with stage_timer("Projection", lambda: prj.depth16):
        prj = _stage_project_x(cloud, uniforms, cfg)
    with stage_timer("Sort", lambda: pairs.keys):
        pairs = _stage_sort_x(prj, cfg)
    with stage_timer("Boundaries", lambda: start):
        start, end = _stage_bounds_x(pairs, cfg)
    with stage_timer("Render", lambda: out.image):
        out = _stage_render_x(pairs, start, end, prj,
                              uniforms.heatmap_factor, cfg, tile_capacity)
    stats = FrameStats(
        num_pairs=pairs.num_pairs,
        num_overflow=pairs.num_overflow,
        max_tile_count=jnp.max(out.tile_counts),
    )
    return FrameOutput(
        image=out.image, stats=stats,
        sorted_values=pairs.values, tile_start=start, tile_end=end,
        tile_t0=out.tile_t0, splat_pos=prj.pos,
    )


def render_multiview(
    cloud: SplatCloud,
    uniforms_batched: FrameUniforms,   # every leaf has a leading view axis
    cfg: RasterizerConfig,
    tile_capacity: int = 2048,
) -> jnp.ndarray:
    """Batched multi-view rendering on one chip (BASELINE config 5: N cameras
    per step): sequential map over the view axis, sharing the splat model.
    For multi-chip view parallelism see parallel/sharded.py."""
    def one(uni):
        return render_frame(cloud, uni, cfg, tile_capacity).image

    return jax.lax.map(one, uniforms_batched)


def pick_splat_position(
    frame: FrameOutput,
    tile_id: int | jnp.ndarray,
) -> jnp.ndarray:
    """Device part of `get_splat_position`
    (gaussian_splatting_rasterizer.gd:162-171, gsplat_render.glsl:103-110):
    the splat 10% into the target tile's depth range, or +inf if the tile is
    empty / fully transparent. Host applies basis_override⁻¹·(−x,−y,z)."""
    s = frame.tile_start[tile_id]
    e = frame.tile_end[tile_id]
    n = e - s
    idx = frame.sorted_values[jnp.clip(s + n // 10, 0, frame.sorted_values.shape[0] - 1)]
    pos = frame.splat_pos[idx]
    hit = (n > 0) & (frame.tile_t0[tile_id] != 1.0)
    return jnp.where(hit, pos, jnp.inf)
