"""Fast-path (block-hierarchical + Pallas render) tests, interpret mode on CPU."""

import dataclasses

import numpy as np
import pytest

from godotgaussiansplatting_tpu import (Camera, RasterizerConfig,
                                        render_frame_jit, synthetic_scene)
from godotgaussiansplatting_tpu.models.splats import from_arrays
from godotgaussiansplatting_tpu.ops.blocks import BLOCK_SIZE, morton_order
from godotgaussiansplatting_tpu.ops.fast_pipeline import (
    pick_splat_position_fast, render_frame_fast)
from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
from godotgaussiansplatting_tpu.utils.image import hwc


def _mortonize(cloud):
    order = morton_order(np.asarray(cloud.means)[:cloud.num_splats])
    full = np.arange(cloud.capacity)
    full[:cloud.num_splats] = order
    return dataclasses.replace(
        cloud, means=cloud.means[full], cov3d=cloud.cov3d[full],
        opacity=cloud.opacity[full], sh=cloud.sh[full],
        upload_time=cloud.upload_time[full])


def _psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    return 10 * np.log10(1.0 / max(mse, 1e-12))


@pytest.mark.slow
def test_single_center_tile_matches_exact():
    """All splats share one center tile → the (tile, depth) cluster sort
    leaves pure depth order, so the fast path must match the exact pipeline
    to float tolerance (kernel math + ordering both exercised: the splats
    span many tiles via large radii)."""
    rng = np.random.default_rng(0)
    n = 512
    means = np.zeros((n, 3), np.float32)
    z = rng.uniform(2.0, 8.0, n).astype(np.float32)   # wide depth range
    # Constant NDC position (x ∝ z) keeps every center inside ONE tile —
    # centers that straddle a tile boundary legitimately allow cross-block
    # inversions, which is not what this test probes.
    means[:, 0] = (-0.15 + rng.uniform(-0.01, 0.01, n)) * z
    means[:, 1] = (-0.15 + rng.uniform(-0.01, 0.01, n)) * z
    means[:, 2] = z
    scales = rng.uniform(0.05, 0.25, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, (n,)).astype(np.float32)
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0] = rng.uniform(0, 2, (n, 3))
    cloud = from_arrays(means, scales, q, opac, sh)

    cfg = RasterizerConfig(width=96, height=96,
                           reference_boundary_quirk=False)
    uni = make_uniforms(Camera.reset_pose(), cfg)
    fast = render_frame_fast(cloud, uni, cfg, interpret=True)
    exact = render_frame_jit(cloud, uni, cfg, tile_capacity=1024)
    # 1e-2 bar (not 1e-3): the fast kernel's documented ε-envelopes vs
    # exact mode — per-pixel t-cutoff applied at batch granularity only,
    # mutual non-occlusion of equal-depth16 ties, and the <=0.1% opacity
    # clamp — measure ~5e-3 max on this deep opaque stack (see
    # ops/render_pallas3.py docstring). Exact mode alone carries the
    # reference 1e-3 parity bar.
    np.testing.assert_allclose(hwc(np.asarray(fast.image)),
                               np.asarray(exact.image), atol=1e-2)


@pytest.mark.slow
def test_random_scene_psnr():
    """Random scene vs exact mode: v3 ordering (batch depth-indicator
    matmul + gated batch-lag-1 corrections + per-tile big lanes) must
    render nearly indistinguishable imagery. Round-1's block-mean ordering
    measured ~24-26 dB here; the gate is >= 40 dB (typically 46+)."""
    cfg = RasterizerConfig(width=128, height=128,
                           reference_boundary_quirk=False)
    cloud = _mortonize(synthetic_scene(4000, seed=5, extent=2.5,
                                       scale_range=(0.01, 0.08)))
    uni = make_uniforms(Camera.reset_pose(), cfg)
    fast = render_frame_fast(cloud, uni, cfg, interpret=True)
    exact = render_frame_jit(cloud, uni, cfg, tile_capacity=512)
    p = _psnr(hwc(np.asarray(fast.image))[:, :, :3],
              np.asarray(exact.image)[:, :, :3])
    assert p > 40.0, f"fast-path PSNR too low: {p:.1f} dB"


@pytest.mark.slow
def test_blocks_gather_variant_bit_identical():
    """GS_BLOCKS_GATHER=1 (perm-sort + packed payload gather in
    ops/blocks2.py) must produce bit-identical frames to the variadic-sort
    default — it is a pure data-movement A/B knob for device timing."""
    import os
    cfg = RasterizerConfig(width=64, height=64)
    cloud = _mortonize(synthetic_scene(2000, seed=11, extent=2.2,
                                       scale_range=(0.01, 0.1)))
    uni = make_uniforms(Camera.reset_pose(), cfg)
    assert os.environ.get("GS_BLOCKS_GATHER", "0") == "0"
    base = np.asarray(render_frame_fast(cloud, uni, cfg,
                                        interpret=True).image)
    os.environ["GS_BLOCKS_GATHER"] = "1"
    try:
        alt = np.asarray(render_frame_fast(cloud, uni, cfg,
                                           interpret=True).image)
    finally:
        del os.environ["GS_BLOCKS_GATHER"]
    np.testing.assert_array_equal(alt, base)


@pytest.mark.slow
@pytest.mark.parametrize("wh", [(128, 176), (144, 176)])
def test_v4_lockstep_matches_v3(wh):
    """kernel="v4" (GT=4 tiles per lockstep grid step,
    ops/render_pallas4.py) must be BIT-identical to v3: same batch
    boundaries, ordering masks and exchange semantics per tile — only the
    MXU issue schedule and fixed-cost amortization differ. Covers an odd
    tile count (144 -> gx=9, one padded lockstep slot)."""
    w, h = wh
    cloud = _mortonize(synthetic_scene(3000, seed=9, extent=2.5,
                                       scale_range=(0.01, 0.1)))
    cfg3 = RasterizerConfig(width=w, height=h)
    cfg4 = RasterizerConfig(width=w, height=h, kernel="v4")
    uni = make_uniforms(Camera.reset_pose(), cfg3)
    v3 = render_frame_fast(cloud, uni, cfg3, interpret=True)
    v4 = render_frame_fast(cloud, uni, cfg4, interpret=True)
    np.testing.assert_array_equal(np.asarray(v4.image),
                                  np.asarray(v3.image))
    assert int(v4.stats.num_pairs) == int(v3.stats.num_pairs)


@pytest.mark.slow
def test_sparse_first_tiles_finite():
    """Regression: the render kernel's chain payload ring is read beyond a
    tile's block count (gated to zero mass) — at the very first tiles those
    lanes predate any DMA, and uninitialized VMEM NaN/Inf bit patterns
    defeat the additive gate. Low opacity keeps early exit from masking the
    read. The whole first tile row rendered NaN before the t==0 ring zero
    (ops/render_pallas3.py)."""
    import dataclasses
    cfg = RasterizerConfig(width=128, height=176)
    cloud = _mortonize(synthetic_scene(3000, seed=9, extent=2.5,
                                       scale_range=(0.01, 0.1)))
    cloud = dataclasses.replace(cloud, opacity=cloud.opacity * 0.15)
    uni = make_uniforms(Camera.reset_pose(), cfg)
    out = render_frame_fast(cloud, uni, cfg, interpret=True)
    img = np.asarray(out.image)          # planar (4, H, W)
    assert np.isfinite(img).all()
    assert img[:3].max() > 0.01


def test_early_exit_changes_nothing():
    cfg = RasterizerConfig(width=64, height=64,
                           reference_boundary_quirk=False)
    cloud = _mortonize(synthetic_scene(2000, seed=7, extent=2.0,
                                       scale_range=(0.02, 0.1)))
    uni = make_uniforms(Camera.reset_pose(), cfg)
    a = render_frame_fast(cloud, uni, cfg, interpret=True, early_exit=True)
    b = render_frame_fast(cloud, uni, cfg, interpret=True, early_exit=False)
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                               atol=1e-6)


def test_heatmap_and_picking_fast():
    cfg = RasterizerConfig(width=64, height=64,
                           reference_boundary_quirk=False)
    cloud = _mortonize(synthetic_scene(2000, seed=3, extent=1.5,
                                       scale_range=(0.02, 0.1)))
    uni = make_uniforms(Camera.reset_pose(), cfg)
    base = render_frame_fast(cloud, uni, cfg, interpret=True)
    hm = render_frame_fast(cloud, uni._replace(
        heatmap_factor=base.image.dtype.type(1.0)), cfg, interpret=True)
    assert np.abs(np.asarray(hm.image) - np.asarray(base.image)).max() > 1e-3

    # picking: center tile should be occupied, and the picked position must
    # be an actual splat mean (the reference returns the world position of
    # the splat 10% into the tile's depth range, gsplat_render.glsl:103-110)
    gx, _ = cfg.tile_dims
    tile = (2 * gx) + 2
    pos = np.asarray(pick_splat_position_fast(base, tile, cloud, 1.0, cfg))
    assert np.all(np.isfinite(pos))
    means = np.asarray(cloud.means[: cloud.num_splats])
    d = np.linalg.norm(means - pos[None, :], axis=1)
    assert d.min() < 1e-4, f"picked position is not a splat mean (min {d.min()})"

    # a tile with no covering splats must return the +inf sentinel
    # (gaussian_splatting_rasterizer.gd:171): render the same cloud shrunk
    # to the image center so corner tiles are provably empty
    small = render_frame_fast(cloud, uni._replace(
        model_scale=uni.model_scale * 0.05), cfg, interpret=True)
    empty = np.asarray(pick_splat_position_fast(small, 0, cloud, 0.05, cfg))
    assert np.all(np.isinf(empty)), f"empty-tile pick returned {empty}"


def test_fast_transcendentals_accuracy():
    """The lowp kernels' bit-assembly exp / log1p(-a) (render_pallas3.fexp,
    fln_one_minus) must stay ~30x below bf16 precision across their full
    operating ranges, flush GATE_OFF lanes to ordering-inert values, and be
    exactly 0 at alpha == 0.

    MUST run under jax.jit: the original round-to-nearest magic-constant
    trick was accurate eagerly but XLA's algebraic simplifier cancelled
    (y + C) - C under jit, zeroing the fraction (41% relative error, 22 dB
    frames). Eager-only accuracy checks cannot catch that class of bug."""
    import jax
    from godotgaussiansplatting_tpu.ops.blocks2 import GATE_OFF
    from godotgaussiansplatting_tpu.ops.render_pallas3 import (
        ALPHA_MAX, fexp, fln_one_minus)
    fexp = jax.jit(fexp)
    fln_one_minus = jax.jit(fln_one_minus)

    x = np.concatenate([np.linspace(-87.0, 1.0, 40001),
                        np.array([GATE_OFF, -500.0, 0.0, 1.0])]
                       ).astype(np.float32)
    got = np.asarray(fexp(x)).astype(np.float64)
    ref = np.exp(np.minimum(x.astype(np.float64), 80.0))
    ref = np.maximum(ref, np.exp(-87.0))          # documented clamp floor
    rel = np.abs(got - ref) / ref
    assert rel.max() < 2.5e-4, rel.max()

    a = np.concatenate([np.linspace(0.0, ALPHA_MAX, 40001),
                        np.array([0.0, 1e-30, ALPHA_MAX])]).astype(np.float32)
    got = np.asarray(fln_one_minus(a)).astype(np.float64)
    ref = np.log1p(-a.astype(np.float64))
    err = np.abs(got - ref)
    rel = err / np.maximum(np.abs(ref), 1e-12)
    # relative accuracy where la is meaningful; tiny-alpha lanes only need
    # absolute accuracy (their la rounds away inside bf16 sums regardless)
    assert ((rel < 2.5e-4) | (err < 1e-6)).all(), (rel.max(), err.max())
    assert got[a == 0.0].max() == 0.0


@pytest.mark.slow
def test_words_payload_matches_cooked():
    """cfg.words_payload ships the render kernel the sorted-word image and
    cooks features in-kernel; pixels must match the cooked 16-row payload
    path to fp-association noise, and stats + picking must agree exactly."""
    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.ops.fast_pipeline import (
        pick_splat_position_fast, render_frame_fast)
    from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms

    cloud = gs.mortonize(gs.synthetic_scene(
        30_000, seed=11, extent=3.0, scale_range=(0.01, 0.25)))
    cfg = gs.RasterizerConfig(width=256, height=256)
    cfgw = cfg.replace(words_payload=True)
    uni = make_uniforms(gs.Camera.reset_pose(), cfg)
    fc = render_frame_fast(cloud, uni, cfg, interpret=True)
    fw = render_frame_fast(cloud, uni, cfgw, interpret=True)
    assert int(fc.stats.num_pairs) == int(fw.stats.num_pairs)
    assert int(fc.stats.num_overflow) == int(fw.stats.num_overflow)
    a, b = np.asarray(fc.image), np.asarray(fw.image)
    mse = float(((a - b) ** 2).mean())
    psnr = 10 * np.log10(max(float(np.abs(a).max()), 1.0) ** 2
                         / max(mse, 1e-12))
    assert psnr > 60.0, f"words vs cooked PSNR {psnr:.1f} dB"
    p1 = np.asarray(pick_splat_position_fast(fc, 120, cloud, 1.0, cfg))
    p2 = np.asarray(pick_splat_position_fast(fw, 120, cloud, 1.0, cfgw))
    np.testing.assert_array_equal(p1, p2)
