"""The photogrammetry-faithful scene (models/splats.photogrammetry_scene)
must exhibit a trained 3DGS model's marginal statistics — the reference's
real workload (/root/reference/README.md:26,58) — and render cleanly
through both pipelines."""

import numpy as np

from godotgaussiansplatting_tpu import RasterizerConfig, Camera
from godotgaussiansplatting_tpu.models.splats import (mortonize,
                                                      photogrammetry_scene)
from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
from godotgaussiansplatting_tpu.ops.fast_pipeline import render_frame_fast
from godotgaussiansplatting_tpu.ops.pipeline import render_frame


def test_marginals():
    c = photogrammetry_scene(100_000, seed=1)
    n = c.num_splats
    op = np.asarray(c.opacity[:n])
    cov = np.asarray(c.cov3d[:n])
    rms = np.sqrt(np.maximum(cov[:, 0] + cov[:, 3] + cov[:, 5], 0) / 3)

    # bimodal opacity: a near-saturated mode AND a wispy tail, nothing
    # below the trainer's 0.005 prune threshold
    assert (op > 0.9).mean() > 0.35
    assert (op < 0.1).mean() > 0.05
    assert op.min() >= 0.005

    # log-normal scales spanning >= 3 orders of magnitude (big-splat path
    # food: the p99.9 tail must be >100x the median)
    assert np.percentile(rms, 99.9) / np.percentile(rms, 50) > 100

    # background shell exists: some splats far outside the core extent
    rad = np.linalg.norm(np.asarray(c.means[:n]), axis=1)
    assert (rad > 10.0).mean() > 0.02

    # SH band energy decays from DC
    sh = np.asarray(c.sh[:n])
    e_dc = np.abs(sh[:, 0]).mean()
    e1 = np.abs(sh[:, 1:4]).mean()
    e3 = np.abs(sh[:, 9:16]).mean()
    assert e_dc > e1 > e3


def test_renders_both_pipelines():
    cfg = RasterizerConfig(width=128, height=96,
                           reference_boundary_quirk=False)
    cloud = mortonize(photogrammetry_scene(20_000, seed=3, extent=2.0))
    # camera INSIDE the scene (360-capture geometry)
    uni = make_uniforms(Camera.reset_pose(), cfg)
    exact = np.asarray(render_frame(cloud, uni, cfg,
                                    tile_capacity=4096).image)
    from godotgaussiansplatting_tpu.utils.image import hwc
    fast = hwc(np.asarray(render_frame_fast(cloud, uni, cfg,
                                            interpret=True).image))
    assert np.isfinite(exact).all() and np.isfinite(fast).all()
    assert exact[:, :, :3].max() > 0.05  # the sky shell fills the frame
    mse = float(np.mean((exact[:, :, :3] - fast[:, :, :3]) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # fast-vs-exact fidelity gate on REAL-statistics data (giant background
    # splats + bimodal opacity), mirroring tests/test_fast_pipeline.py's bar
    assert psnr >= 40.0, f"fast-path PSNR {psnr:.1f} dB < 40 dB"
