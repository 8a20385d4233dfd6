"""render_scale coverage (VERDICT round-2 item #7).

The reference exposes render scale as a live slider (main.gd:51, 0.05-1.5)
and documents its sub-linear FPS behavior (README.md:62: fixed 16-px tiles
concentrate splats per tile as resolution drops). Here the knob changes
`RasterizerConfig.target_size`, the tile grid, the picking window→target
coordinate transform (engine/rasterizer.py) and re-specializes every jit —
none of which had tests before this module.
"""

import numpy as np

from godotgaussiansplatting_tpu import (Camera, RasterizerConfig,
                                        render_frame_jit, synthetic_scene)
from godotgaussiansplatting_tpu.engine.rasterizer import Rasterizer
from godotgaussiansplatting_tpu.ops.oracle import oracle_render
from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms


def test_half_scale_matches_oracle():
    """A frame at render_scale 0.5 equals the oracle run at the scaled
    resolution: target_size, tile grid and projection focal lengths all
    derive from the scaled target (texture_size setter parity,
    gaussian_splatting_rasterizer.gd:26-29)."""
    cfg = RasterizerConfig(width=256, height=192, render_scale=0.5)
    assert cfg.target_size == (128, 96)
    cloud = synthetic_scene(800, seed=11, extent=2.0,
                            scale_range=(0.01, 0.12))
    uni = make_uniforms(Camera.reset_pose(), cfg)
    ref_img, info = oracle_render(
        cloud, np.asarray(uni.view), np.asarray(uni.proj),
        np.asarray(uni.camera_pos), cfg)
    out = render_frame_jit(cloud, uni, cfg, tile_capacity=512)
    assert out.image.shape == (96, 128, 4)
    np.testing.assert_allclose(np.asarray(out.image), ref_img, atol=1e-3)


def test_engine_resize_via_render_scale():
    """Changing rasterizer.render_scale between frames re-specializes the
    frame jit at the new target (the reference's reset_render_texture path,
    main.gd:51,134-137)."""
    cloud = synthetic_scene(2000, seed=4, extent=2.0,
                            scale_range=(0.02, 0.1))
    r = Rasterizer(cloud, texture_size=(192, 128), tile_capacity=512)
    full = np.asarray(r.rasterize(sync=True).image)
    assert full.shape == (128, 192, 4)
    r.render_scale = 0.5
    half = np.asarray(r.rasterize(sync=True).image)
    assert half.shape == (64, 96, 4)
    assert r.texture_size == (96, 64)
    # same scene content at both scales: compare the downsampled images
    ds = full.reshape(64, 2, 96, 2, 4).mean((1, 3))
    corr = np.corrcoef(ds[..., :3].ravel(), half[..., :3].ravel())[0, 1]
    assert corr > 0.95, f"scaled render decorrelated from full: {corr:.3f}"


def test_picking_roundtrip_under_render_scale():
    """get_splat_position takes WINDOW pixels and multiplies by render_scale
    to reach the target (engine/rasterizer.py); a pick at the window position
    of a known splat must return (approximately) that splat at any scale."""
    n = 64
    rng = np.random.default_rng(9)
    from godotgaussiansplatting_tpu.models.splats import from_arrays
    means = np.zeros((n, 3), np.float32)
    means[:, 0] = rng.uniform(-0.8, 0.8, n)
    means[:, 1] = rng.uniform(-0.6, 0.6, n)
    means[:, 2] = rng.uniform(2.5, 3.5, n)
    scales = np.full((n, 3), 0.05, np.float32)
    quats = np.tile(np.array([0, 0, 0, 1], np.float32), (n, 1))
    opac = np.full(n, 0.95, np.float32)
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0] = 1.5
    cloud = from_arrays(means, scales, quats, opac, sh)

    for rs in (1.0, 0.5):
        r = Rasterizer(cloud, texture_size=(256, 192), tile_capacity=256)
        r.render_scale = rs
        r.rasterize(sync=True)
        # project splat 0 to window pixels with the engine's own matrices
        cam = r.camera
        w, h = 256, 192  # window (unscaled) size
        tw, th = r.texture_size
        view = cam.view_matrix()
        proj = cam.projection_matrix(tw, th)
        p = means[0]
        vp = view[:3, :3] @ p + view[:3, 3]
        clip = proj[:3, :3] @ vp + proj[:3, 3]
        cw = proj[3, :3] @ vp + proj[3, 3]
        win = ((clip[:2] / cw) * 0.5 + 0.5) * np.array([w, h])
        pos = r.get_splat_position((float(win[0]), float(win[1])))
        assert np.all(np.isfinite(pos)), f"pick missed at render_scale {rs}"
        # picked splat is the depth-10% one in that tile; with a loose bound
        # it must come from the neighborhood of the target splat
        d = np.linalg.norm(pos - np.array([-p[0], -p[1], p[2]]) * [-1, -1, 1])
        assert d < 1.5, f"pick {pos} far from {p} at render_scale {rs}"


def test_viewer_state_resize_path():
    """The viewer /state handler drives Rasterizer.render_scale; exercising
    ViewerState.apply_ui end-to-end (without HTTP) covers the resize path the
    reference triggers from its ImGui slider (main.gd:51)."""
    from godotgaussiansplatting_tpu.viewer.server import ViewerState
    cloud = synthetic_scene(500, seed=2, extent=1.5, scale_range=(0.02, 0.1))
    r = Rasterizer(cloud, texture_size=(128, 96), tile_capacity=256)
    st = ViewerState(r)
    st.apply_ui({"rscale": 0.5, "mscale": 1.25, "fov": 80, "heatmap": 1})
    assert abs(r.render_scale - 0.5) < 1e-9
    assert abs(r.model_scale - 1.25) < 1e-9
    assert r.should_enable_heatmap
    out = r.rasterize(sync=True)
    assert out.image.shape == (48, 64, 4)
    # world-space cursor projection: set a focus point and check it lands
    # inside the unit screen square for the default pose
    # godot frame; the reset pose looks toward +Z (camera.gd:151-153)
    st.cursor_world = np.array([0.0, 0.0, 3.0], np.float32)
    frac = st.cursor_screen()
    assert frac is not None
    assert 0.0 < frac[0] < 1.0 and 0.0 < frac[1] < 1.0
