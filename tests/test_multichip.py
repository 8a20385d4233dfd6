"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from godotgaussiansplatting_tpu import (Camera, RasterizerConfig,
                                        render_frame_jit, synthetic_scene)
from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
from godotgaussiansplatting_tpu.parallel.sharded import (
    make_mesh, render_frame_sharded, stack_uniforms)


@pytest.mark.parametrize("n_view,n_tile", [(1, 2), (1, 4), (2, 4)])
def test_sharded_matches_single_device(n_view, n_tile):
    cfg = RasterizerConfig(width=128, height=64 * n_tile,
                           reference_boundary_quirk=False)
    cloud = synthetic_scene(2000, seed=5, extent=2.5, scale_range=(0.01, 0.1))
    cams = [Camera.reset_pose().with_yaw_pitch(180 + 15 * i, -5 * i)
            for i in range(n_view)]
    unis = [make_uniforms(c, cfg) for c in cams]

    mesh = make_mesh(n_view=n_view, n_tile=n_tile)
    img_sharded, npairs = render_frame_sharded(
        cloud, stack_uniforms(unis), cfg, mesh, tile_capacity=512)
    img_sharded = np.asarray(img_sharded)
    assert img_sharded.shape == (n_view, cfg.target_size[1],
                                 cfg.target_size[0], 4)

    for v in range(n_view):
        single = render_frame_jit(cloud, unis[v], cfg, tile_capacity=512)
        np.testing.assert_allclose(
            img_sharded[v], np.asarray(single.image), atol=2e-3,
            err_msg=f"view {v} mismatch")


def test_mesh_shapes():
    mesh = make_mesh(n_view=2, n_tile=4)
    assert mesh.shape == {"view": 2, "tile": 4}
    assert len(jax.devices()) >= 8


def test_fast_sharded_matches_single_device():
    from godotgaussiansplatting_tpu.models.splats import mortonize
    from godotgaussiansplatting_tpu.ops.fast_pipeline import render_frame_fast
    from godotgaussiansplatting_tpu.parallel.sharded import (
        render_frame_fast_sharded)

    cfg = RasterizerConfig(width=128, height=128)
    cloud = mortonize(synthetic_scene(3000, seed=9, extent=2.5,
                                      scale_range=(0.01, 0.1)))
    cam = Camera.reset_pose()
    uni = make_uniforms(cam, cfg)

    mesh = make_mesh(n_view=1, n_tile=2)
    img, npairs = render_frame_fast_sharded(
        cloud, stack_uniforms([uni]), cfg, mesh, interpret=True)
    img = np.asarray(img)[0]

    single = render_frame_fast(cloud, uni, cfg, interpret=True)
    np.testing.assert_allclose(img, np.asarray(single.image), atol=2e-3)
    assert int(np.asarray(npairs)[0]) == int(single.stats.num_pairs)
