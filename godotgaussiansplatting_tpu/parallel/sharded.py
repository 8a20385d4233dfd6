"""Multi-chip SPMD rendering over a jax.sharding.Mesh.

The reference is single-GPU (SURVEY.md §2.4); this is the TPU-native scaling
story it lacks:

* axis "view":  batched multi-view rendering — cameras are a batch axis
                (BASELINE config 5: 8 cameras/step), sharded across devices.
* axis "tile":  spatial parallelism within one view. Splats are sharded over
                devices for projection + block build (data-parallel); blocks
                are then exchanged so each device holds only the blocks whose
                rects intersect its slab of tile rows, and renders that slab.

Tile-row slabs are PADDED to ceil(rows / n_tile) — any resolution shards on
any device count (1080p = 68 rows splits 8-way as 9-row slabs; the wrapper
crops the padding rows).

The fast-path block exchange is a fixed-capacity all-to-all (lax.all_to_all
over ICI): device s sends slab d the (compacted, capped) subset of its local
blocks intersecting slab d. Per-device memory is O(B/D · overlap) instead of
the O(B) a full all-gather costs; dropped blocks due to the cap are counted
and returned (`num_exchange_overflow`) rather than silently lost.
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
    """Rows of tiles per device slab (tile grid split along y, padded)."""
    _, gy = cfg.tile_dims
    return -(-gy // n_tile)


def stack_uniforms(unis) -> FrameUniforms:
    """Stack per-camera FrameUniforms into the view-batched form."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *unis)


def render_frame_sharded(
    cloud: SplatCloud,
    uniforms: FrameUniforms,
    cfg: RasterizerConfig,
    mesh: Mesh,
    tile_capacity: int = 512,
    pairs_per_device: int | None = None,
):
    """One exact-mode frame over the ("view", "tile") mesh.

    uniforms fields must carry a leading view-batch axis of size
    mesh.shape["view"] (use stack_uniforms). Returns (images, num_pairs,
    num_slab_overflow): images (n_view, H, W, 4); num_slab_overflow counts
    pairs dropped because a device's slab buffer (pairs_per_device) was too
    small — hot slabs overflow first, so this is reported per frame rather
    than silently dropped (the reference analogue is the 10N overflow flag,
    main.gd:100).

    This path all-gathers the projected set (O(N) per device): it is the
    correctness/telemetry reference. The fast path below scales memory 1/D.
    """
    n_tile = mesh.shape["tile"]
    rows_per = _slab_rows(cfg, n_tile)
    P_ = cloud.capacity
    k_local = pairs_per_device or (cfg.sort_buffer_factor * P_ // n_tile)

    def step(means, cov3d, opac, sh, uptime, view, proj, cam_pos,
             model_scale, time, heatmap):
        view, proj, cam_pos = view[0], proj[0], cam_pos[0]
        model_scale, time, heatmap = model_scale[0], time[0], heatmap[0]

        prj = project_splats(means, cov3d, opac, sh, uptime,
                             view, proj, cam_pos, model_scale, time, cfg)
        gathered = jax.tree.map(
            lambda x: jax.lax.all_gather(x, "tile", tiled=True), prj)

        slab = jax.lax.axis_index("tile")
        y0 = slab * rows_per
        rect = gathered.rect
        ry0 = jnp.clip(rect[:, 1], y0, y0 + rows_per)
        ry1 = jnp.clip(rect[:, 3], y0, y0 + rows_per)
        srect = jnp.stack([rect[:, 0], ry0 - y0, rect[:, 2], ry1 - y0],
                          axis=-1)
        snt = jnp.maximum(srect[:, 2] - srect[:, 0], 0) * jnp.maximum(
            srect[:, 3] - srect[:, 1], 0)
        svalid = gathered.valid & (snt > 0)
        snt = jnp.where(svalid, snt, 0)

        # Per-slab boundary extraction: the reference's last-run quirk is a
        # global-buffer artifact; applying it per slab would drop one run per
        # device, so multi-chip output is the quirk-free image.
        slab_cfg = cfg.replace(height=rows_per * cfg.tile_size,
                               width=cfg.target_size[0], render_scale=1.0,
                               reference_boundary_quirk=False)
        pairs = emit_and_sort(svalid, srect, snt, gathered.depth16,
                              slab_cfg, capacity=k_local)
        start, end = tile_boundaries(pairs.keys, pairs.num_pairs, slab_cfg)

        out = render_tiles(pairs.values, start, end, gathered.image_pos,
                           gathered.conic, gathered.color, heatmap,
                           slab_cfg, tile_capacity=tile_capacity,
                           pixel_offset=(0, y0 * cfg.tile_size))
        total_pairs = jax.lax.psum(pairs.num_pairs, "tile")
        slab_over = jax.lax.psum(
            jnp.maximum(pairs.num_pairs - k_local, 0), "tile")
        return out.image[None], total_pairs[None], slab_over[None]

    splat_spec = P("tile")
    uni_spec = P("view")
    step_sharded = shard_map(
        step, mesh=mesh,
        in_specs=(splat_spec, splat_spec, splat_spec, splat_spec, splat_spec,
                  uni_spec, uni_spec, uni_spec, uni_spec, uni_spec, uni_spec),
        out_specs=(P("view", "tile"), P("view"), P("view")),
    )

    img, npairs, nover = step_sharded(
        cloud.means, cloud.cov3d, cloud.opacity, cloud.sh, cloud.upload_time,
        uniforms.view, uniforms.proj, uniforms.camera_pos,
        uniforms.model_scale, uniforms.time, uniforms.heatmap_factor)
    h = cfg.target_size[1]
    return img[:, :h], npairs, nover


def render_frame_fast_sharded(
    cloud: SplatCloud,
    uniforms: FrameUniforms,
    cfg: RasterizerConfig,
    mesh: Mesh,
    supertile_cap: int = 1024,
    tile_cap: int = 256,
    exchange_cap: int | None = None,
    lowp: bool = True,
    interpret: bool = False,
):
    """Multi-chip fast path over the ("view", "tile") mesh.

    Work split (one view): projection AND the block build — the heavy prep
    stages — run data-parallel over the sharded splat axis (superblocks never
    cross shard boundaries, so the block structure is identical to
    single-chip). Blocks then move to the devices whose tile-row slabs their
    rects intersect via ONE fixed-capacity lax.all_to_all (payload + packed
    metadata); each device bins + renders its slab with the v3 Pallas kernel.

    Returns (images (n_view, 4, H, W) PLANAR — the fast path's TPU-native
    render-target layout, see ops/render_pallas3.assemble_image_v3 —
    num_pairs (n_view,), num_exchange_overflow (n_view,)). exchange_cap is
    the per-(src, dst) block budget; default 4·B_local/n_tile (clamped to
    B_local, i.e. a lossless exchange whenever a shard's blocks fit).
    """
    from ..ops.blocks2 import (BLOCK_SIZE, BlockFrame2, build_block_frame2,
                               build_block_frame2_words)
    from ..ops.bigbin import bin_bigs
    from ..ops.binning2 import bin_blocks2
    from ..ops.projection_pallas import project_words
    from ..ops.render_pallas3 import assemble_image_v3, render_tiles_v3

    n_tile = mesh.shape["tile"]
    rows_per = _slab_rows(cfg, n_tile)
    assert cloud.capacity % (BLOCK_SIZE * n_tile) == 0, (
        f"capacity {cloud.capacity} must split into whole blocks "
        f"across {n_tile} devices")
    b_local = cloud.capacity // BLOCK_SIZE // n_tile
    k_x = exchange_cap or min(b_local, max(-(-4 * b_local // n_tile), 16))
    k_x = min(k_x, b_local)

    def step(means, cov3d, opac, sh, uptime, view, proj, cam_pos,
             model_scale, time, heatmap):
        view, proj, cam_pos = view[0], proj[0], cam_pos[0]
        model_scale, time, heatmap = model_scale[0], time[0], heatmap[0]

        # num_splats stays the FULL count: shards hold Morton-contiguous
        # (spatially local) ranges at full local density, so the adaptive
        # cell granularity must match single-chip — and when the per-shard
        # capacity is a whole number of superblocks, shard clustering is
        # then IDENTICAL to single-chip (tested in tests/test_multichip.py)
        if cfg.projection_kernel:
            # The shipping single-chip config (fast_defaults) runs the fused
            # Pallas projection; the sharded path honors it so multi-chip
            # correctness evidence covers the config users actually run.
            words = project_words(means, cov3d, opac, sh, uptime,
                                  view, proj, cam_pos, model_scale, time,
                                  cfg, num_splats=cloud.num_splats,
                                  interpret=interpret)
            bf, bigs = build_block_frame2_words(
                words, cfg, num_splats=cloud.num_splats,
                big_cap=cfg.big_capacity, words_payload=cfg.words_payload)
        else:
            prj = project_splats(means, cov3d, opac, sh, uptime,
                                 view, proj, cam_pos, model_scale, time, cfg)
            bf, bigs = build_block_frame2(prj, cfg,
                                          num_splats=cloud.num_splats,
                                          big_cap=cfg.big_capacity,
                                          words_payload=cfg.words_payload)

        # --- block exchange: local blocks -> owning slabs ------------------
        r = bf.rect                               # (B_loc, 4) global tiles
        nonempty = (r[:, 2] > r[:, 0]) & (r[:, 3] > r[:, 1])
        dst = jnp.arange(n_tile, dtype=jnp.int32)[:, None]
        dy0 = dst * rows_per
        inter = ((r[:, 1][None] < dy0 + rows_per) & (r[:, 3][None] > dy0)
                 & nonempty[None])                # (n_tile, B_loc)
        bigk = jnp.uint32(0xFFFFFFFF)
        selkey = jnp.where(
            inter, jnp.arange(b_local, dtype=jnp.uint32)[None], bigk)
        selkey = jax.lax.sort(selkey, dimension=1)[:, :k_x]  # (n_tile, k_x)
        sel_ok = selkey != bigk
        sel = jnp.where(sel_ok, selkey, 0).astype(jnp.int32)
        n_int = jnp.sum(inter, axis=1)
        over = jnp.sum(jnp.maximum(n_int - k_x, 0))

        def take(a):
            return jnp.take(a, sel.reshape(-1), axis=0).reshape(
                (n_tile, k_x) + a.shape[1:])

        pay_s = take(bf.payload)                  # (n_tile, k_x, 16, S)
        rect_s = jnp.where(sel_ok[..., None], take(bf.rect), 0)
        bm_s = jnp.where(sel_ok, take(bf.bitmap), 0)
        mm_s = jnp.where(sel_ok, (take(bf.min_depth) << 16)
                         | (take(bf.max_depth) & 0xFFFF), bigk)
        nv_s = jnp.where(sel_ok, take(bf.num_valid), 0)

        def a2a(x):
            return jax.lax.all_to_all(x, "tile", split_axis=0,
                                      concat_axis=0)

        pool = BlockFrame2(
            payload=a2a(pay_s).reshape(n_tile * k_x, *bf.payload.shape[1:]),
            rect=a2a(rect_s).reshape(n_tile * k_x, 4),
            bitmap=a2a(bm_s).reshape(-1),
            min_depth=(lambda m: m >> 16)(a2a(mm_s).reshape(-1)),
            max_depth=(lambda m: m & 0xFFFF)(a2a(mm_s).reshape(-1)),
            num_valid=a2a(nv_s).reshape(-1),
            num_culled_pairs=bf.num_culled_pairs,
        )

        slab = jax.lax.axis_index("tile")
        y0 = slab * rows_per
        slab_cfg = cfg.replace(height=rows_per * cfg.tile_size,
                               width=cfg.target_size[0], render_scale=1.0)
        bins = bin_blocks2(pool, slab_cfg, supertile_cap=supertile_cap,
                           tile_cap=tile_cap, tile_row_offset=y0)
        # big lanes: every shard extracted its local bigs; gather the whole
        # set (small — ~0.5% of splats), then RE-SORT it by (depth16, idx):
        # ops/bigbin.py's compaction keys on table POSITION, which must be
        # the global front-to-back rank (each shard's table is only locally
        # sorted)
        def ag(x):
            return jax.lax.all_gather(x, "tile", tiled=True)
        d_all = ag(bigs.depth16)
        tbl_all = ag(bigs.table)
        idx_all = jax.lax.bitcast_convert_type(tbl_all[:, 13], jnp.uint32)
        _, _, order = jax.lax.sort(
            (d_all, idx_all,
             jnp.arange(d_all.shape[0], dtype=jnp.int32)),
            dimension=0, num_keys=2, is_stable=True)
        bigs_all = type(bigs)(
            table=tbl_all[order], depth16=d_all[order],
            rect=ag(bigs.rect)[order], valid=ag(bigs.valid)[order],
            residual=jax.lax.psum(bigs.residual, "tile"))
        tile_bigs = bin_bigs(bigs_all, slab_cfg, tile_row_offset=y0)
        tiles = render_tiles_v3(
            pool.payload, bins, tile_bigs, heatmap, slab_cfg, lowp=lowp,
            interpret=interpret, pixel_offset_y=y0 * cfg.tile_size)
        image, _ = assemble_image_v3(tiles, slab_cfg)   # (4, Hslab, W)
        total_pairs = jax.lax.psum(bf.num_culled_pairs, "tile")
        total_over = jax.lax.psum(over, "tile")
        return image[None], total_pairs[None], total_over[None]

    splat_spec = P("tile")
    uni_spec = P("view")
    step_sharded = shard_map(
        step, mesh=mesh,
        in_specs=(splat_spec, splat_spec, splat_spec, splat_spec, splat_spec,
                  uni_spec, uni_spec, uni_spec, uni_spec, uni_spec, uni_spec),
        # planar slabs concatenate along H (axis 2 of (view, 4, Hslab, W))
        out_specs=(P("view", None, "tile"), P("view"), P("view")),
        # pallas_call inside shard_map cannot declare per-axis vma yet
        check_vma=False,
    )
    img, npairs, nover = step_sharded(
        cloud.means, cloud.cov3d, cloud.opacity, cloud.sh, cloud.upload_time,
        uniforms.view, uniforms.proj, uniforms.camera_pos,
        uniforms.model_scale, uniforms.time, uniforms.heatmap_factor)
    h = cfg.target_size[1]
    return img[:, :, :h], npairs, nover
