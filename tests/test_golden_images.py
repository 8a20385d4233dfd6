"""Golden-image regression corpus (VERDICT round-1 item #9).

tests/golden/scene.ply is a committed Inria-convention model exercising the
quirk stack (SH3 bands, big-splat segregation, translucent depth stacks,
bimodal opacity); view*.png are exact-mode renders (ops/render.py — the
in-repo analogue of gsplat_render.glsl's globally sorted traversal).
Any change to the projection/sort/render math that shifts pixels shows up
here at pixel level, not just oracle level.

Regenerate after INTENDED visual changes: python tests/golden/generate.py
"""

import json
import os

import numpy as np
import pytest

import godotgaussiansplatting_tpu as gs
from godotgaussiansplatting_tpu.models.ply import load_splats
from godotgaussiansplatting_tpu.utils.image import read_png, to_uint8

pytestmark = pytest.mark.slow  # interpret-mode / mesh suites: full tier only

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _meta():
    with open(os.path.join(HERE, "meta.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def golden_cloud():
    return load_splats(os.path.join(HERE, "scene.ply"), upload_time=-1e9)


@pytest.fixture(scope="module")
def golden_cfg():
    m = _meta()
    return gs.RasterizerConfig(width=m["size"], height=m["size"],
                               max_tiles_per_splat=256)


def _cameras():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "golden_generate", os.path.join(HERE, "generate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.cameras()


@pytest.mark.parametrize("view", [0, 1, 2])
def test_exact_matches_golden(golden_cloud, golden_cfg, view):
    ref = read_png(os.path.join(HERE, f"view{view}.png"))
    uni = gs.make_uniforms(_cameras()[view], golden_cfg)
    out = gs.render_frame_jit(golden_cloud, uni, golden_cfg,
                              tile_capacity=_meta()["tile_capacity"])
    assert int(out.stats.num_overflow) == 0
    got = to_uint8(np.asarray(out.image))
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    # Bitwise stability is not guaranteed across jax/XLA versions; allow
    # 2 LSB of drift but require it to be rare.
    assert diff.max() <= 2, f"view{view}: max u8 diff {diff.max()}"
    frac_off = float((diff > 1).mean())
    assert frac_off < 0.005, f"view{view}: {frac_off:.2%} pixels off by 2"


@pytest.mark.parametrize("view", [0, 2])
def test_fast_mode_matches_golden(golden_cloud, golden_cfg, view):
    from godotgaussiansplatting_tpu.ops.fast_pipeline import render_frame_fast
    ref = read_png(os.path.join(HERE, f"view{view}.png")).astype(np.float32)
    cloud = gs.mortonize(golden_cloud)
    uni = gs.make_uniforms(_cameras()[view], golden_cfg)
    out = render_frame_fast(cloud, uni, golden_cfg, interpret=True)
    got = to_uint8(np.asarray(out.image)).astype(np.float32)
    mse = float(np.mean((got - ref) ** 2))
    psnr = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 40.0, f"view{view}: fast-vs-golden PSNR {psnr:.1f} dB"
