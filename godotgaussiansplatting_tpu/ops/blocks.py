"""Shared clustering utilities for the TPU fast path.

Holds the host-side Morton ordering (run once at load; gives blocks spatial
locality so their projected rects stay tight) and the clustering constants
shared by ops/blocks2.py. The round-1 per-frame block builder that lived
here was superseded by ops/blocks2.py (stage-2 intra-block depth sort + MXU
power features) and removed.

Design rationale (measured on v5e, see SURVEY.md §7 hard parts): XLA's
global sort (~0.36 Gkeys/s), gather and scatter (~0.1-0.15 Gelem/s) make
the reference's pair-level pipeline (sort 10-30M duplicated keys, gather
48 B payload rows per pair — gsplat_projection.glsl:216-226,
radix_sort_*.glsl) untenable on TPU. The one fast data-movement primitive
is the *batched row-wise sort* (~3 Gkeys/s, variadic payload operands ride
along almost free), so the fast path clusters splats into fixed blocks and
never builds per-splat-pair structures (the ~0.5% big-splat subset is the
exception — ops/bigbin.py).
"""

from __future__ import annotations

import numpy as np

import os as _os

BLOCK_SIZE = 128    # splats per block (tight rects vs DMA efficiency)
# Splats re-clustered together per frame (64 blocks at the default).
# GS_SUPERBLOCK is a sweep-only import-time override for device A/Bs of the
# stage-1 sort width (bitonic stage count scales with log2(width)); the
# shipped value is the measured choice: 8192 beat 16384 by 1.9 ms/frame at
# the 5.8M/1080p headline (65.9 vs 67.8 ms, round 5 — fewer bitonic merge
# stages; clustering quality is unchanged because a superblock spans many
# screen cells either way). 32768 does not divide the 16384 pad multiple.
SUPERBLOCK = int(_os.environ.get("GS_SUPERBLOCK", "8192"))
CELL_SHIFT = 1      # screen-cluster cell edge in tiles = 2^CELL_SHIFT
# px; splats at least this wide are extracted into the per-tile big-lane
# lists (ops/bigbin.py). GS_BIG_RADIUS is a sweep-only import-time override.
BIG_RADIUS = float(_os.environ.get("GS_BIG_RADIUS", "32.0"))


def morton_order(means: np.ndarray, bits: int = 10) -> np.ndarray:
    """Host-side Morton (Z-curve) argsort of splat positions. Run once at
    load; gives blocks spatial locality so their projected rects stay tight.
    Uses the native C++ kernel (native/plyio.cpp) when available."""
    try:
        from ..native import available, morton3
        if available():
            return np.argsort(morton3(np.asarray(means, np.float32)),
                              kind="stable")
    except Exception:
        pass
    p = np.asarray(means, np.float64)
    lo = p.min(axis=0)
    span = np.maximum(p.max(axis=0) - lo, 1e-9)
    q = np.clip(((p - lo) / span * (2**bits - 1)), 0, 2**bits - 1).astype(np.uint64)

    def spread(x):
        x &= 0x3FF
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2))
    return np.argsort(code, kind="stable")


def hilbert_order(means: np.ndarray, bits: int = 10) -> np.ndarray:
    """Host-side 3D Hilbert-curve argsort of splat positions (Skilling's
    transpose algorithm, vectorized numpy). Run once at load.

    Versus the Morton Z-curve, the Hilbert curve has no discontinuous
    jumps, so consecutive 128-splat runs ("bricks", cfg.cluster) bound
    ~20% tighter boxes — measured at the 5.8M/1080p headline: tile-bin
    dilution 3.14x -> 2.80x, blocks/tile 124 -> 110, identical depth
    spreads. ~4 s for 5.8M splats on host (one-time; the Morton path
    keeps its native C++ kernel for comparison sweeps)."""
    p = np.asarray(means, np.float64)
    lo = p.min(axis=0)
    span = np.maximum(p.max(axis=0) - lo, 1e-9)
    X = np.clip((p - lo) / span * (2**bits - 1), 0,
                2**bits - 1).astype(np.int64)
    M = 1 << (bits - 1)
    Q = M
    while Q > 1:                      # inverse-undo + exchange (Skilling)
        P = Q - 1
        for i in range(3):
            cond = (X[:, i] & Q) != 0
            X[:, 0] = np.where(cond, X[:, 0] ^ P, X[:, 0])
            t = np.where(cond, 0, (X[:, 0] ^ X[:, i]) & P)
            X[:, 0] ^= t
            X[:, i] ^= t
        Q >>= 1
    X[:, 1] ^= X[:, 0]                # Gray encode
    X[:, 2] ^= X[:, 1]
    t = np.zeros(len(X), dtype=np.int64)
    Q = M
    while Q > 1:
        t = np.where((X[:, 2] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    for i in range(3):
        X[:, i] ^= t
    key = np.zeros(len(X), dtype=np.int64)
    for j in range(bits - 1, -1, -1):  # transpose-form bit interleave
        for i in range(3):
            key = (key << 1) | ((X[:, i] >> j) & 1)
    return np.argsort(key, kind="stable")


# Load-time space-filling curve for mortonize()/the brick clustering.
# GS_CURVE=morton is a sweep-only override for device A/Bs.
CURVE = _os.environ.get("GS_CURVE", "hilbert")


def order_splats(means: np.ndarray, bits: int = 10) -> np.ndarray:
    """The shipping load-time ordering (see CURVE)."""
    if CURVE == "hilbert":
        return hilbert_order(means, bits)
    return morton_order(means, bits)
