"""Big-splat extraction (ops/blocks2.BigSet) + per-tile binning (ops/bigbin).

The big-splat subset is the fast path's pathological case (any block
grouping gives whole-scene depth ranges or whole-screen rects), so its
machinery gets direct unit coverage: extraction completeness vs the
max(rx, ry) >= BIG_RADIUS ground truth (a round-2 window bug silently dropped
~30% of bigs behind culled lanes and only showed up as a 2x render
regression), per-tile depth order, closest-first truncation, and overflow
accounting.
"""

import numpy as np
import pytest

import godotgaussiansplatting_tpu as gs
from godotgaussiansplatting_tpu.ops.bigbin import bin_bigs
from godotgaussiansplatting_tpu.ops.blocks import BIG_RADIUS
from godotgaussiansplatting_tpu.ops.blocks2 import extents_from_conic
from godotgaussiansplatting_tpu.ops.blocks2 import (DEPTH_INVALID,
                                                    build_block_frame2)
from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
from godotgaussiansplatting_tpu.ops.projection import project_splats

pytestmark = pytest.mark.slow  # interpret-mode / mesh suites: full tier only


def _project(cloud, cfg):
    uni = make_uniforms(gs.Camera.reset_pose(), cfg)
    return project_splats(
        cloud.means, cloud.cov3d, cloud.opacity, cloud.sh, cloud.upload_time,
        uni.view, uni.proj, uni.camera_pos, uni.model_scale, uni.time, cfg)


def test_extraction_is_complete_under_capacity():
    """Every valid max-extent>=BIG_RADIUS splat must be extracted (residual 0)
    when the capacity allows — bigs left in chains bloat block rects."""
    cloud = gs.mortonize(gs.synthetic_scene(
        60_000, seed=9, extent=3.0, scale_range=(0.02, 0.25)))
    cfg = gs.RasterizerConfig(width=512, height=512)
    prj = _project(cloud, cfg)
    rx, ry = extents_from_conic(prj.conic[:, 0], prj.conic[:, 1],
                                prj.conic[:, 2], prj.color[:, 3])
    n_true = int(np.asarray(
        (np.maximum(rx, ry) >= BIG_RADIUS) & prj.valid).sum())
    assert n_true > 100, "scene must actually contain big splats"
    bf, bigs = build_block_frame2(prj, cfg, num_splats=cloud.num_splats,
                                  big_cap=max(2048, n_true + 128))
    n_taken = int(np.asarray(bigs.valid).sum())
    assert n_taken == n_true
    assert int(np.asarray(bigs.residual)) == 0
    # extracted lanes must be gone from the chains: total valid lanes
    # across chain blocks + bigset = all valid projected splats
    n_chain = int(np.asarray(bf.num_valid).sum())
    n_valid = int(np.asarray(prj.valid).sum())
    assert n_chain + n_taken == n_valid


def test_capacity_overflow_counts_residual():
    cloud = gs.mortonize(gs.synthetic_scene(
        60_000, seed=9, extent=3.0, scale_range=(0.02, 0.25)))
    cfg = gs.RasterizerConfig(width=512, height=512)
    prj = _project(cloud, cfg)
    rx, ry = extents_from_conic(prj.conic[:, 0], prj.conic[:, 1],
                                prj.conic[:, 2], prj.color[:, 3])
    n_true = int(np.asarray(
        (np.maximum(rx, ry) >= BIG_RADIUS) & prj.valid).sum())
    bf, bigs = build_block_frame2(prj, cfg, num_splats=cloud.num_splats,
                                  big_cap=256)
    n_taken = int(np.asarray(bigs.valid).sum())
    assert n_taken == 256
    assert int(np.asarray(bigs.residual)) == n_true - 256
    # residual bigs stay renderable in the chains (never dropped)
    n_chain = int(np.asarray(bf.num_valid).sum())
    assert n_chain + n_taken == int(np.asarray(prj.valid).sum())


def test_per_tile_lists_are_front_to_back_and_closest_first():
    cloud = gs.mortonize(gs.synthetic_scene(
        60_000, seed=9, extent=3.0, scale_range=(0.02, 0.25)))
    cfg = gs.RasterizerConfig(width=512, height=512)
    prj = _project(cloud, cfg)
    _, bigs = build_block_frame2(prj, cfg, num_splats=cloud.num_splats)
    tb = bin_bigs(bigs, cfg, obig=32)   # small cap to force truncation
    pay = np.asarray(tb.bigpay)                      # (T, 16, 32)
    nbig = np.asarray(tb.tile_nbig)
    depths = pay[:, 12, :]
    assert nbig.max() == 32 and int(np.asarray(tb.overflow)) > 0
    for t in np.argsort(-nbig)[:16]:
        n = nbig[t]
        d = depths[t]
        assert np.all(np.diff(d[:n]) >= 0), "tile big list not depth-sorted"
        assert np.all(d[n:] >= DEPTH_INVALID * 0.99), "dead lanes not parked"
    # truncation keeps the CLOSEST lanes: compare against a no-cap run
    tb_full = bin_bigs(bigs, cfg, obig=256)
    pay_f = np.asarray(tb_full.bigpay)
    nbig_f = np.asarray(tb_full.tile_nbig)
    t = int(np.argmax(nbig))
    assert nbig_f[t] >= nbig[t]
    np.testing.assert_array_equal(pay[t, 12, :nbig[t]],
                                  pay_f[t, 12, :nbig[t]])


def test_pixel_parity_big_heavy_scene():
    """Fast path with many big splats still matches exact mode (>=40 dB)."""
    cloud = gs.mortonize(gs.synthetic_scene(
        12_000, seed=4, extent=2.0, scale_range=(0.05, 0.3)))
    cfg = gs.RasterizerConfig(width=256, height=256, max_tiles_per_splat=256,
                              reference_boundary_quirk=False)
    uni = make_uniforms(gs.Camera.reset_pose(), cfg)
    from godotgaussiansplatting_tpu.ops.fast_pipeline import render_frame_fast
    fast = render_frame_fast(cloud, uni, cfg, interpret=True)
    exact = gs.render_frame_jit(cloud, uni, cfg, tile_capacity=4096)
    from godotgaussiansplatting_tpu.utils.image import hwc
    a = np.asarray(exact.image)[:, :, :3]
    b = hwc(np.asarray(fast.image))[:, :, :3]
    mse = float(((a - b) ** 2).mean())
    psnr = 10 * np.log10(max(float(a.max()), 1.0) ** 2 / max(mse, 1e-12))
    assert psnr > 40.0, f"big-heavy fast-vs-exact PSNR {psnr:.1f} dB"
