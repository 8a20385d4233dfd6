"""Checkpoint round-trip + single-chip multi-view batch tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from godotgaussiansplatting_tpu import (Camera, RasterizerConfig,
                                        synthetic_scene)
from godotgaussiansplatting_tpu.engine.rasterizer import Rasterizer
from godotgaussiansplatting_tpu.engine.state import load_state, save_state
from godotgaussiansplatting_tpu.ops.pipeline import (make_uniforms,
                                                     render_multiview)


def test_state_roundtrip(tmp_path):
    cloud = synthetic_scene(1500, seed=2, extent=2.0, scale_range=(0.02, 0.1))
    r = Rasterizer(cloud, texture_size=(64, 64), quality="exact",
                   tile_capacity=256)
    r.model_scale = 1.5
    r.should_enable_heatmap = True
    img0 = r.image()

    p = os.path.join(tmp_path, "state.npz")
    save_state(p, r)
    r2 = load_state(p)
    assert r2.model_scale == 1.5
    assert r2.should_enable_heatmap
    assert r2.cloud.num_splats == r.cloud.num_splats
    img1 = r2.image()
    np.testing.assert_allclose(img1, img0, atol=1e-5)


def test_multiview_batch_matches_individual():
    cfg = RasterizerConfig(width=64, height=64)
    cloud = synthetic_scene(1000, seed=4, extent=2.0, scale_range=(0.02, 0.1))
    cams = [Camera.reset_pose().with_yaw_pitch(180 + 20 * i, -4 * i)
            for i in range(3)]
    unis = [make_uniforms(c, cfg) for c in cams]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *unis)

    imgs = np.asarray(render_multiview(cloud, batched, cfg,
                                       tile_capacity=256))
    assert imgs.shape == (3, 64, 64, 4)
    from godotgaussiansplatting_tpu import render_frame_jit
    for i, u in enumerate(unis):
        single = np.asarray(render_frame_jit(cloud, u, cfg,
                                             tile_capacity=256).image)
        np.testing.assert_allclose(imgs[i], single, atol=1e-5)
