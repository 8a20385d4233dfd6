"""Golden test: the jit pipeline matches the NumPy oracle end to end.

This is the core correctness bar (BASELINE.md: per-pixel RGBA within 1e-3).
"""

import numpy as np
import pytest

from godotgaussiansplatting_tpu import (Camera, FrameUniforms,
                                        RasterizerConfig, render_frame_jit,
                                        synthetic_scene)
from godotgaussiansplatting_tpu.ops.oracle import oracle_render


def make_uniforms(cam: Camera, cfg: RasterizerConfig, model_scale=1.0,
                  time=1e9, heatmap=0.0):
    import jax.numpy as jnp
    w, h = cfg.target_size
    return FrameUniforms(
        view=jnp.asarray(cam.view_matrix()),
        proj=jnp.asarray(cam.projection_matrix(w, h)),
        camera_pos=jnp.asarray(cam.camera_pos_ply()),
        model_scale=jnp.float32(model_scale),
        time=jnp.float32(time),
        heatmap_factor=jnp.float32(heatmap),
    )


@pytest.mark.parametrize("seed,n,heatmap", [(0, 500, 0.0), (1, 2000, 0.0),
                                            (2, 800, 1.0)])
def test_frame_matches_oracle(seed, n, heatmap):
    cfg = RasterizerConfig(width=128, height=96)
    cloud = synthetic_scene(n, seed=seed, extent=2.0,
                            scale_range=(0.01, 0.12))
    cam = Camera.reset_pose()
    uni = make_uniforms(cam, cfg, heatmap=heatmap)

    ref_img, info = oracle_render(
        cloud, np.asarray(uni.view), np.asarray(uni.proj),
        np.asarray(uni.camera_pos), cfg, heatmap_factor=heatmap)

    out = render_frame_jit(cloud, uni, cfg, tile_capacity=512)
    img = np.asarray(out.image)

    assert int(out.stats.num_overflow) == 0
    assert int(out.stats.num_pairs) == info["num_pairs"]
    assert int(out.stats.max_tile_count) <= 512, "capacity exceeded; raise it"
    np.testing.assert_allclose(img, ref_img, atol=1e-3, rtol=0)


def test_empty_scene_black_image():
    cfg = RasterizerConfig(width=64, height=64)
    cloud = synthetic_scene(10, seed=0)
    cam = Camera.reset_pose()
    # Camera looking away: splats sit at +Z (PLY); flip to look at -Z side.
    cam = cam.with_yaw_pitch(0.0, 0.0)  # identity basis looks down Godot -Z = PLY -Z
    uni = make_uniforms(cam, cfg)
    out = render_frame_jit(cloud, uni, cfg, tile_capacity=64)
    img = np.asarray(out.image)
    assert int(out.stats.num_pairs) == 0
    np.testing.assert_array_equal(img[:, :, :3], 0.0)
    np.testing.assert_array_equal(img[:, :, 3], 1.0)


def test_model_scale_and_fade_in():
    """model_scale and the load fade-in animation are observable."""
    cfg = RasterizerConfig(width=96, height=64)
    cloud = synthetic_scene(300, seed=3, extent=1.5, scale_range=(0.02, 0.1))
    cam = Camera.reset_pose()
    for ms, t in [(0.5, 1e9), (2.0, 1e9), (1.0, 0.5)]:
        uni = make_uniforms(cam, cfg, model_scale=ms, time=t)
        ref_img, _ = oracle_render(
            cloud, np.asarray(uni.view), np.asarray(uni.proj),
            np.asarray(uni.camera_pos), cfg, model_scale=ms, time=t)
        out = render_frame_jit(cloud, uni, cfg, tile_capacity=512)
        np.testing.assert_allclose(np.asarray(out.image), ref_img, atol=1e-3)


def test_giant_splat_dense_emission():
    """Splats whose rect exceeds max_tiles_per_splat emit densely (no pair
    truncation) when giant_splat_capacity covers them — the oracle never caps,
    so pair counts and pixels must match exactly (ops/sort.py giant path)."""
    base = dict(width=128, height=96)
    cloud = synthetic_scene(60, seed=5, extent=1.5, scale_range=(0.2, 0.9))
    cam = Camera.reset_pose()

    # Tiny per-splat cap forces most splats into the giant path.
    cfg = RasterizerConfig(**base, max_tiles_per_splat=4,
                           giant_splat_capacity=64)
    uni = make_uniforms(cam, cfg)
    ref_img, info = oracle_render(
        cloud, np.asarray(uni.view), np.asarray(uni.proj),
        np.asarray(uni.camera_pos), cfg)
    out = render_frame_jit(cloud, uni, cfg, tile_capacity=512)
    assert int(out.stats.num_overflow) == 0
    assert int(out.stats.num_pairs) == info["num_pairs"]
    np.testing.assert_allclose(np.asarray(out.image), ref_img, atol=1e-3,
                               rtol=0)

    # The round-5 TIER ladder alone (giant path off) must also cover these
    # wide splats with zero truncation and oracle-exact pixels.
    cfgt = RasterizerConfig(**base, max_tiles_per_splat=4,
                            giant_splat_capacity=0,
                            exact_tiers=((16, 16), (256, 64)))
    outt = render_frame_jit(cloud, make_uniforms(cam, cfgt), cfgt,
                            tile_capacity=512)
    assert int(outt.stats.num_overflow) == 0
    assert int(outt.stats.num_pairs) == info["num_pairs"]
    np.testing.assert_allclose(np.asarray(outt.image), ref_img, atol=1e-3,
                               rtol=0)

    # gcap=0 + no tiers restores the truncating cap: pairs drop and
    # overflow is counted.
    cfg0 = RasterizerConfig(**base, max_tiles_per_splat=4,
                            giant_splat_capacity=0, exact_tiers=())
    out0 = render_frame_jit(cloud, make_uniforms(cam, cfg0), cfg0,
                            tile_capacity=512)
    assert int(out0.stats.num_overflow) > 0
    assert (int(out0.stats.num_pairs) + int(out0.stats.num_overflow)
            == info["num_pairs"])

    # Capacity smaller than the giant count: excess giants truncate but are
    # still counted, never silently lost.
    cfg1 = RasterizerConfig(**base, max_tiles_per_splat=4,
                            giant_splat_capacity=2, exact_tiers=())
    out1 = render_frame_jit(cloud, make_uniforms(cam, cfg1), cfg1,
                            tile_capacity=512)
    assert (int(out1.stats.num_pairs) + int(out1.stats.num_overflow)
            == info["num_pairs"])


def test_sort_buffer_overflow_drops_in_emission_order():
    """When total pairs exceed the 10N sort buffer, the overflow must drop in
    EMISSION (splat-major) order — the reference's fixed buffer simply never
    holds pairs past 10N (gaussian_splatting_rasterizer.gd:79). A round-4
    regression dropped the tail of the SORTED buffer instead, deleting the
    highest tile ids wholesale (black band at the frame bottom)."""
    import jax.numpy as jnp

    from godotgaussiansplatting_tpu.config import INVALID_KEY
    from godotgaussiansplatting_tpu.ops.sort import emit_and_sort

    cfg = RasterizerConfig(width=128, height=128, max_tiles_per_splat=64,
                           reference_boundary_quirk=False)
    P, gx = 64, cfg.tile_dims[0]
    rng = np.random.default_rng(3)
    x0 = rng.integers(0, gx - 4, P)
    y0 = rng.integers(0, gx - 4, P)
    rect = np.stack([x0, y0, x0 + 4, y0 + 4], 1).astype(np.int32)
    num_tiles = np.full((P,), 16, np.int32)
    depth16 = rng.integers(0, 0xFFFE, P).astype(np.uint32)
    valid = np.ones((P,), bool)

    # capacity for only half the pairs -> the LAST splats' pairs drop
    cap = P * 16 // 2
    sp = emit_and_sort(jnp.asarray(valid), jnp.asarray(rect),
                       jnp.asarray(num_tiles), jnp.asarray(depth16), cfg,
                       capacity=cap)
    keys = np.asarray(sp.keys)
    vals = np.asarray(sp.values)
    live = keys != INVALID_KEY
    assert live.sum() == cap                      # buffer exactly full
    # surviving pairs = precisely the pairs of the first P/2 splats
    surv = np.sort(vals[live])
    expect = np.repeat(np.arange(P // 2), 16)
    np.testing.assert_array_equal(surv, expect)
    # every surviving pair count per tile matches a direct emission of the
    # first-half splats (no tile blanked by sorted-order truncation)
    sp_half = emit_and_sort(jnp.asarray(valid[:P // 2]),
                            jnp.asarray(rect[:P // 2]),
                            jnp.asarray(num_tiles[:P // 2]),
                            jnp.asarray(depth16[:P // 2]), cfg,
                            capacity=cap)
    np.testing.assert_array_equal(keys, np.asarray(sp_half.keys))
