"""Multi-chip SPMD rendering over a jax.sharding.Mesh.

The reference is single-GPU (SURVEY.md §2.4); this is the TPU-native scaling
story it lacks:

* axis "view":  batched multi-view rendering — cameras are a batch axis
                (BASELINE config 5: 8 cameras/step), sharded across devices.
* axis "tile":  spatial parallelism within one view. Splats are sharded over
                devices for projection (data-parallel); each device then
                all-gathers the compact projected set over ICI, emits/sorts
                only the pairs of its own slab of tile rows, and renders that
                slab. The image comes back row-sharded.

The all-gather rides ICI (the mesh is the communication backend standing in
for the reference's "none"). Sorting is per-slab, so sort work scales 1/D.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RasterizerConfig
from ..models.splats import SplatCloud
from ..ops.pipeline import FrameUniforms
from ..ops.projection import project_splats
from ..ops.render import render_tiles
from ..ops.sort import emit_and_sort, tile_boundaries


def make_mesh(n_view: int = 1, n_tile: int | None = None) -> Mesh:
    devs = np.array(jax.devices())
    if n_tile is None:
        n_tile = len(devs) // n_view
    assert n_view * n_tile <= len(devs)
    return Mesh(devs[: n_view * n_tile].reshape(n_view, n_tile),
                axis_names=("view", "tile"))


def _slab_rows(cfg: RasterizerConfig, n_tile: int) -> int:
    """Rows of tiles per device slab (tile grid split along y)."""
    gx, gy = cfg.tile_dims
    assert gy % n_tile == 0, (
        f"tile rows {gy} must divide the tile-axis size {n_tile}; "
        f"pick a height multiple of {cfg.tile_size * n_tile}")
    return gy // n_tile


def render_frame_sharded(
    cloud: SplatCloud,
    uniforms: FrameUniforms,
    cfg: RasterizerConfig,
    mesh: Mesh,
    tile_capacity: int = 512,
    pairs_per_device: int | None = None,
):
    """One frame over the ("view", "tile") mesh.

    uniforms fields must carry a leading view-batch axis of size
    mesh.shape["view"] (use jax.tree.map(stack, ...) over per-camera uniforms).
    Returns images of shape (n_view, H, W, 4), sharded (view, tile-rows).
    """
    n_view = mesh.shape["view"]
    n_tile = mesh.shape["tile"]
    rows_per = _slab_rows(cfg, n_tile)
    gx, gy = cfg.tile_dims
    P_ = cloud.capacity
    k_local = pairs_per_device or (cfg.sort_buffer_factor * P_ // n_tile)

    def step(means, cov3d, opac, sh, uptime, view, proj, cam_pos,
             model_scale, time, heatmap):
        # view-batch axis arrives already sliced to this device's camera.
        view, proj, cam_pos = view[0], proj[0], cam_pos[0]
        model_scale, time, heatmap = model_scale[0], time[0], heatmap[0]

        # --- stage 1: data-parallel projection over the splat shard ---
        prj = project_splats(means, cov3d, opac, sh, uptime,
                             view, proj, cam_pos, model_scale, time, cfg)

        # --- gather the compact projected set over ICI ---
        gathered = jax.tree.map(
            lambda x: jax.lax.all_gather(x, "tile", tiled=True), prj)

        # --- stage 2+3: this device's tile-row slab only ---
        slab = jax.lax.axis_index("tile")
        y0 = slab * rows_per
        rect = gathered.rect
        ry0 = jnp.clip(rect[:, 1], y0, y0 + rows_per)
        ry1 = jnp.clip(rect[:, 3], y0, y0 + rows_per)
        srect = jnp.stack([rect[:, 0], ry0 - y0, rect[:, 2], ry1 - y0], axis=-1)
        snt = jnp.maximum(srect[:, 2] - srect[:, 0], 0) * jnp.maximum(
            srect[:, 3] - srect[:, 1], 0)
        svalid = gathered.valid & (snt > 0)
        snt = jnp.where(svalid, snt, 0)

        # Per-slab boundary extraction: the reference's last-run quirk is a
        # global-buffer artifact; applying it per slab would drop one run per
        # device, so it is disabled here (multi-chip output is the quirk-free
        # image).
        slab_cfg = cfg.replace(height=rows_per * cfg.tile_size,
                               width=cfg.target_size[0], render_scale=1.0,
                               reference_boundary_quirk=False)
        pairs = emit_and_sort(svalid, srect, snt, gathered.depth16,
                              slab_cfg, capacity=k_local)
        start, end = tile_boundaries(pairs.keys, pairs.num_pairs, slab_cfg)

        # --- stage 4: render the slab ---
        out = render_tiles(pairs.values, start, end, gathered.image_pos,
                           gathered.conic, gathered.color, heatmap,
                           slab_cfg, tile_capacity=tile_capacity,
                           pixel_offset=(0, y0 * cfg.tile_size))
        total_pairs = jax.lax.psum(pairs.num_pairs, "tile")
        return out.image[None], total_pairs[None]

    # Splat arrays: axis 0 = splats → shard over "tile".
    splat_spec = P("tile")
    uni_spec = P("view")
    step_sharded = shard_map(
        step, mesh=mesh,
        in_specs=(splat_spec, splat_spec, splat_spec, splat_spec, splat_spec,
                  uni_spec, uni_spec, uni_spec, uni_spec, uni_spec, uni_spec),
        out_specs=(P("view", "tile"), P("view")),
    )

    img, npairs = step_sharded(
        cloud.means, cloud.cov3d, cloud.opacity, cloud.sh, cloud.upload_time,
        uniforms.view, uniforms.proj, uniforms.camera_pos,
        uniforms.model_scale, uniforms.time, uniforms.heatmap_factor)
    return img, npairs


def stack_uniforms(unis) -> FrameUniforms:
    """Stack per-camera FrameUniforms into the view-batched form."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *unis)


def render_frame_fast_sharded(
    cloud: SplatCloud,
    uniforms: FrameUniforms,
    cfg: RasterizerConfig,
    mesh: Mesh,
    supertile_cap: int = 1024,
    tile_cap: int = 256,
    interpret: bool = False,
):
    """Multi-chip fast path over the ("view", "tile") mesh.

    Work split (one view): projection AND the per-superblock re-cluster sort
    — the two heavy prep stages — run data-parallel over the sharded splat
    axis (superblocks never cross shard boundaries, so the block structure is
    identical to single-chip). The compact BlockFrame is then all-gathered
    over ICI and each device bins + renders its own slab of tile rows.
    Returns (n_view, H, W, 4) images, view/row sharded.
    """
    from ..ops.blocks import BLOCK_SIZE, build_block_frame
    from ..ops.binning import bin_blocks
    from ..ops.render_pallas import assemble_image, render_tiles_pallas

    n_tile = mesh.shape["tile"]
    rows_per = _slab_rows(cfg, n_tile)
    assert cloud.capacity % (BLOCK_SIZE * n_tile) == 0, (
        f"capacity {cloud.capacity} must split into whole blocks "
        f"across {n_tile} devices")

    def step(means, cov3d, opac, sh, uptime, view, proj, cam_pos,
             model_scale, time, heatmap):
        view, proj, cam_pos = view[0], proj[0], cam_pos[0]
        model_scale, time, heatmap = model_scale[0], time[0], heatmap[0]

        prj = project_splats(means, cov3d, opac, sh, uptime,
                             view, proj, cam_pos, model_scale, time, cfg)
        bf = build_block_frame(prj, cfg)          # local superblocks only
        bf = jax.tree.map(
            lambda x: jax.lax.all_gather(x, "tile", tiled=True)
            if x.ndim > 0 else jax.lax.psum(x, "tile"), bf)

        slab = jax.lax.axis_index("tile")
        y0 = slab * rows_per
        slab_cfg = cfg.replace(height=rows_per * cfg.tile_size,
                               width=cfg.target_size[0], render_scale=1.0)
        bins = bin_blocks(bf, slab_cfg, supertile_cap=supertile_cap,
                          tile_cap=tile_cap, tile_row_offset=y0)
        tiles = render_tiles_pallas(
            bf.payload, bins.tile_blocks, bins.tile_nblocks,
            bins.tile_candidates, heatmap, slab_cfg, interpret=interpret,
            pixel_offset_y=y0 * cfg.tile_size)
        image, _ = assemble_image(tiles, slab_cfg)
        # num_culled_pairs was already psum'd to the global total above.
        return image[None], bf.num_culled_pairs[None]

    splat_spec = P("tile")
    uni_spec = P("view")
    step_sharded = shard_map(
        step, mesh=mesh,
        in_specs=(splat_spec, splat_spec, splat_spec, splat_spec, splat_spec,
                  uni_spec, uni_spec, uni_spec, uni_spec, uni_spec, uni_spec),
        out_specs=(P("view", "tile"), P("view")),
        # pallas_call inside shard_map cannot declare per-axis vma yet
        check_vma=False,
    )
    return step_sharded(
        cloud.means, cloud.cov3d, cloud.opacity, cloud.sh, cloud.upload_time,
        uniforms.view, uniforms.proj, uniforms.camera_pos,
        uniforms.model_scale, uniforms.time, uniforms.heatmap_factor)
