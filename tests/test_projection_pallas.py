"""Fused Pallas projection (ops/projection_pallas.py) vs the jnp projection.

Bit parity is NOT the contract — the kernel reassociates fp math (fma
chains vs matmuls) — so the gates are: identical culling/stat decisions,
tight numeric tolerance on the per-splat quantities, and end-to-end image
equivalence of the two fast-path variants at >= 50 dB PSNR (far above the
pipeline's own 40 dB fidelity gates)."""

import dataclasses

import jax
import numpy as np
import pytest

from godotgaussiansplatting_tpu import (Camera, RasterizerConfig,
                                        synthetic_scene)
from godotgaussiansplatting_tpu.models.splats import mortonize
from godotgaussiansplatting_tpu.ops.blocks2 import (build_block_frame2,
                                                    build_block_frame2_words)
from godotgaussiansplatting_tpu.ops.fast_pipeline import render_frame_fast
from godotgaussiansplatting_tpu.ops.pipeline import make_uniforms
from godotgaussiansplatting_tpu.ops.projection import project_splats
from godotgaussiansplatting_tpu.ops.projection_pallas import project_words


def test_f16_bits_matches_ieee():
    """The kernel's integer-only f32->f16 conversion must equal numpy's
    IEEE round-to-nearest-even bit-for-bit (normals, subnormals, overflow)."""
    from godotgaussiansplatting_tpu.ops.projection_pallas import _f16_bits
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.normal(0, 1, 4096),                      # normals
        rng.normal(0, 1e-6, 4096),                   # f16 subnormal range
        rng.normal(0, 1e5, 4096),                    # overflow region
        rng.uniform(65400, 65700, 1024),             # overflow boundary
        np.array([0.0, -0.0, 65504.0, 65519.996, 65520.0, 6.1e-5,
                  5.96e-8, 2.98e-8, 2.99e-8, -3.3, 1.0, 0.1]),
    ]).astype(np.float32)
    got = np.asarray(_f16_bits(vals)).astype(np.uint32)
    want = vals.astype(np.float16).view(np.uint16).astype(np.uint32)
    bad = got != want
    assert not bad.any(), (vals[bad][:8], got[bad][:8], want[bad][:8])


def _scene(n=32768, seed=3):
    cloud = synthetic_scene(n, seed=seed, extent=3.0,
                            scale_range=(0.005, 0.2))
    return mortonize(cloud)


def _psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def test_words_match_jnp_projection():
    cloud = _scene()
    cfg = RasterizerConfig(width=512, height=384,
                           quality="fast").fast_defaults()
    uni = make_uniforms(Camera.reset_pose(), cfg)
    args = (cloud.means, cloud.cov3d, cloud.opacity, cloud.sh,
            cloud.upload_time, uni.view, uni.proj, uni.camera_pos,
            uni.model_scale, uni.time, cfg)
    prj = project_splats(*args)
    w = jax.tree.map(np.asarray, project_words(
        *args, num_splats=cloud.num_splats))

    key = w.key.reshape(-1)
    valid_k = key != 0xFFFFFFFF
    valid_j = np.asarray(prj.valid)
    assert (valid_k == valid_j).mean() == 1.0
    m = valid_k
    ipos = np.asarray(prj.image_pos)
    ix = w.ix.reshape(-1).view(np.float32)
    iy = w.iy.reshape(-1).view(np.float32)
    assert np.abs(ix[m] - ipos[m, 0]).max() < 1e-2            # px
    assert np.abs(iy[m] - ipos[m, 1]).max() < 1e-2
    # conic/opacity parity via the packed f16 words (the raw f32 big table
    # was dropped — big lanes now unpack pc1/pc2/rgb9 like the chains do)
    conic = np.asarray(prj.conic)
    color = np.asarray(prj.color)

    def f16_halves(wrd):
        wrd = wrd.reshape(-1)
        lo = (wrd & 0xFFFF).astype(np.uint16).view(np.float16)
        hi = (wrd >> 16).astype(np.uint16).view(np.float16)
        return lo.astype(np.float32), hi.astype(np.float32)

    ca_w, cb_w = f16_halves(w.pc1)
    cc_w, op_w = f16_halves(w.pc2)
    for got, ref in ((ca_w, conic[:, 0]), (cb_w, conic[:, 1]),
                     (cc_w, conic[:, 2]), (op_w, color[:, 3])):
        rel = np.abs(got[m] - ref[m]) / (np.abs(ref[m]) + 1e-5)
        assert rel.max() < 4e-3          # f16 rounding (2^-11) + reassoc
    r9 = w.rgb9.reshape(-1)
    e9 = ((r9 >> 27) & 0x1F).astype(np.int32) - 15
    s9 = np.exp2((e9 - 9).astype(np.float32))
    for sh_, c_ in ((0, 0), (9, 1), (18, 2)):
        got = ((r9 >> sh_) & 0x1FF).astype(np.float32) * s9
        mx = np.maximum(color[:, :3].max(axis=1), 1e-6)
        assert (np.abs(got[m] - color[m, c_]) / mx[m]).max() < 2 ** -8
    # depth16 (key low bits): identical quantization (same divide, same
    # truncation)
    assert ((key & 0xFFFF)[m] == np.asarray(prj.depth16)[m]).all()
    # covered-tile stat: exact parity
    assert (w.cnt.reshape(-1, 128)[:, 1].sum()
            == int(np.asarray(prj.num_tiles).sum()))


def test_words_block_frame_equivalent():
    cloud = _scene()
    cfg = RasterizerConfig(width=512, height=384,
                           quality="fast").fast_defaults()
    uni = make_uniforms(Camera.reset_pose(), cfg)
    args = (cloud.means, cloud.cov3d, cloud.opacity, cloud.sh,
            cloud.upload_time, uni.view, uni.proj, uni.camera_pos,
            uni.model_scale, uni.time, cfg)
    prj = project_splats(*args)
    words = project_words(*args, num_splats=cloud.num_splats)
    bf1, bg1 = build_block_frame2(prj, cfg, num_splats=cloud.num_splats)
    bf2, bg2 = build_block_frame2_words(words, cfg)
    # aggregate structure stats (fp reassociation can flip a boundary
    # splat's screen CELL, permuting the stage-1 order — so per-slot
    # equality is not the contract; per-SPLAT equality below is)
    assert int(bf1.num_culled_pairs) == int(bf2.num_culled_pairs)
    assert int(np.asarray(bf1.num_valid).sum()) == int(
        np.asarray(bf2.num_valid).sum())
    assert np.array_equal(np.asarray(bg1.valid), np.asarray(bg2.valid))
    assert int(bg1.residual) == int(bg2.residual)

    # per-splat payload equality, permutation-invariant: match chain lanes
    # by their source-index row (13) and compare every payload quantity
    def by_idx(payload):
        p = np.asarray(payload)
        flat = p.transpose(1, 0, 2).reshape(16, -1)         # (16, B*S)
        rank = flat[12].view(np.uint32) ^ np.uint32(0x80000000)
        live = (rank >> 16) != 0xFFFF                       # valid lanes
        idx = flat[13].view(np.uint32)[live]
        order = np.argsort(idx)
        assert np.unique(idx).size == idx.size              # each splat once
        return idx[order], flat[:, live][:, order]

    i1, q1 = by_idx(bf1.payload)
    i2, q2 = by_idx(bf2.payload)
    assert np.array_equal(i1, i2)                           # same splat set
    # rank row (depth16<<16 | idx>>7): center-free and bitwise per splat
    assert np.array_equal(q1[12].view(np.uint32), q2[12].view(np.uint32))
    # center-FREE numeric rows per splat: f3/f4/f5 (= -ca/2, -cc/2, -cb),
    # rgb, image position. (f0..f2 and rows 14/15 are block-center-relative
    # — a boundary splat may land in a different block, so those are only
    # meaningful in combination, which the e2e image test gates.)
    # rgb rides rgb9e5 through the sort in both paths: diffs are exactly 0
    # or one 9-bit quantization step when an SH ulp crosses a rounding edge
    for row, tol in ((3, 2e-3), (4, 2e-3), (5, 2e-3),
                     (6, 4.1e-3), (7, 4.1e-3), (8, 4.1e-3),
                     (9, 1e-2), (10, 1e-2)):
        d = np.abs(q1[row] - q2[row])
        assert d.max() < tol, (row, d.max())


@pytest.mark.slow
def test_end_to_end_image_equivalence():
    cloud = _scene(65536, seed=11)
    cfg = RasterizerConfig(width=512, height=384,
                           quality="fast").fast_defaults()
    uni = make_uniforms(Camera.reset_pose(), cfg)
    img_j = np.asarray(render_frame_fast(
        cloud, uni, cfg.replace(projection_kernel=False),
        interpret=True).image)
    img_k = np.asarray(render_frame_fast(
        cloud, uni, cfg.replace(projection_kernel=True),
        interpret=True).image)
    psnr = _psnr(np.clip(img_j[:3], 0, 1), np.clip(img_k[:3], 0, 1))
    assert psnr >= 50.0, psnr
