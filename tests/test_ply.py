"""PLY parser/swizzle property tests (SURVEY.md §4: endianness, property
order, logit/log/quaternion transforms)."""

import io

import numpy as np
import pytest

from godotgaussiansplatting_tpu.models.ply import (PlyError, PlyFile,
                                                   load_splats,
                                                   splat_arrays_from_ply,
                                                   write_ply)
from godotgaussiansplatting_tpu.models.splats import build_covariance


def _random_model(n=64, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32)
    scales = rng.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    opac = rng.uniform(0.05, 0.95, (n,)).astype(np.float32)
    sh = rng.normal(size=(n, 16, 3)).astype(np.float32)
    return means, scales, q, opac, sh


@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip(big_endian):
    means, scales, q, opac, sh = _random_model()
    blob = write_ply(io.BytesIO(), means, scales, q, opac, sh,
                     big_endian=big_endian)
    ply = PlyFile.parse(blob)
    assert ply.size == len(means)
    assert len(ply.properties) == 62
    m2, s2, q2, o2, sh2 = splat_arrays_from_ply(ply)
    np.testing.assert_allclose(m2, means, atol=1e-6)
    np.testing.assert_allclose(s2, scales, rtol=1e-5)
    np.testing.assert_allclose(q2, q, atol=1e-6)
    np.testing.assert_allclose(o2, opac, atol=1e-5)
    np.testing.assert_allclose(sh2, sh, atol=1e-6)


def test_property_order_independent():
    """Loading must key on property *names*, not positions."""
    means, scales, q, opac, sh = _random_model(n=8, seed=1)
    blob = write_ply(io.BytesIO(), means, scales, q, opac, sh)
    ply = PlyFile.parse(blob)
    # Shuffle columns + names consistently.
    rng = np.random.default_rng(2)
    perm = rng.permutation(len(ply.properties))
    ply2 = PlyFile(size=ply.size,
                   properties=[ply.properties[i] for i in perm],
                   vertices=ply.vertices[:, perm])
    m2, s2, q2, o2, sh2 = splat_arrays_from_ply(ply2)
    np.testing.assert_allclose(m2, means, atol=1e-6)
    np.testing.assert_allclose(sh2, sh, atol=1e-6)


def test_get_vertex_dict():
    means, scales, q, opac, sh = _random_model(n=4, seed=3)
    ply = PlyFile.parse(write_ply(io.BytesIO(), means, scales, q, opac, sh))
    v = ply.get_vertex(2)
    assert abs(v["x"] - means[2, 0]) < 1e-6
    assert set(v) == set(ply.properties)


def test_error_paths():
    with pytest.raises(PlyError, match="end_header"):
        PlyFile.parse(b"not a ply")
    means, scales, q, opac, sh = _random_model(n=4)
    blob = write_ply(io.BytesIO(), means, scales, q, opac, sh)
    with pytest.raises(PlyError, match="truncated"):
        PlyFile.parse(blob[:-8])
    with pytest.raises(PlyError, match="format"):
        PlyFile.parse(b"ply\nformat ascii 1.0\nelement vertex 1\n"
                      b"property float x\nend_header\n0")


def test_covariance_matches_quaternion_rotation():
    """cov = R S² Rᵀ (ply_file.gd:49-59) for a known 90° z-rotation."""
    s = np.array([[2.0, 1.0, 0.5]], np.float32)
    ang = np.pi / 2
    q = np.array([[0.0, 0.0, np.sin(ang / 2), np.cos(ang / 2)]], np.float32)
    cov = build_covariance(s, q)[0]
    # 90° about z swaps x/y variances: diag(1, 4, 0.25)
    np.testing.assert_allclose(
        cov, [1.0, 0.0, 0.0, 4.0, 0.0, 0.25], atol=1e-5)


def test_load_splats_device():
    means, scales, q, opac, sh = _random_model(n=32, seed=4)
    blob = write_ply(io.BytesIO(), means, scales, q, opac, sh)
    cloud = load_splats(blob)
    assert cloud.num_splats == 32
    np.testing.assert_allclose(np.asarray(cloud.means)[:32], means, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cloud.opacity)[:32], opac, atol=1e-5)
    # Padding slots are inert.
    assert float(np.asarray(cloud.opacity)[32:].max(initial=0.0)) == 0.0
