"""Splat cloud: the HBM-resident structure-of-arrays splat model.

The reference packs each splat into a 60-float std430 struct
(`gsplat_projection.glsl:33-40`: pos(3)+time(1)+cov3d(6)+opacity(1)+pad(1)+SH(48))
uploaded as one interleaved buffer (`ply_file.gd:37-69`). On TPU we keep a
structure-of-arrays pytree instead: XLA wants contiguous lanes per field, and
SoA lets the projection stage stream exactly the fields it needs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

PAD_MULTIPLE = 16384  # splat-axis padding granularity (= ops.blocks.SUPERBLOCK)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SplatCloud:
    """SoA splat model. All arrays are padded to the same length ``capacity``;
    slots >= ``num_splats`` are inert (opacity forced to 0 at load).

    Fields mirror the reference's GPU Splat struct (gsplat_projection.glsl:33-40):
      means      (P, 3) f32 — world position (PLY frame; x/y negation lives in the camera)
      cov3d      (P, 6) f32 — upper triangle [xx, xy, xz, yy, yz, zz] of R S^2 R^T
      opacity    (P,)   f32 — post-sigmoid opacity (ply_file.gd:62)
      sh         (P, 16, 3) f32 — RGB spherical harmonics, coeff-major (ply_file.gd:65-69)
      upload_time (P,)  f32 — host timestamp of upload, drives the fade-in animation
                              (ply_file.gd:46, gsplat_projection.glsl:169-174)
    """

    means: jax.Array
    cov3d: jax.Array
    opacity: jax.Array
    sh: jax.Array
    upload_time: jax.Array
    num_splats: int = dataclasses.field(metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    def __len__(self) -> int:
        return self.num_splats


def _pad(a: np.ndarray, capacity: int) -> np.ndarray:
    pad = [(0, capacity - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


def build_covariance(scales: np.ndarray, quats_xyzw: np.ndarray) -> np.ndarray:
    """3D covariance upper triangle from (linear) scales and unit quaternions.

    Matches the CPU precompute at ply_file.gd:49-59: cov = (S R^T)^T (S R^T)
    = R S^2 R^T with S = diag(scales). Quaternions are (x, y, z, w) here;
    the PLY stores (w, x, y, z) — the loader reorders (ply_file.gd:50).
    Returns (N, 6): [xx, xy, xz, yy, yz, zz].
    """
    scales = np.asarray(scales, np.float32)
    q = np.asarray(quats_xyzw, np.float32)
    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # Rotation matrix R (rows) from unit quaternion.
    R = np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(*q.shape[:-1], 3, 3)
    S2 = scales[..., None] ** 2  # (N, 3, 1)
    cov = np.einsum("...ik,...k,...jk->...ij", R, S2[..., 0], R)
    return np.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    ).astype(np.float32)


def from_arrays(
    means: np.ndarray,
    scales: np.ndarray,
    quats_xyzw: np.ndarray,
    opacities: np.ndarray,
    sh: np.ndarray,
    upload_time: float | np.ndarray = 0.0,
    capacity: Optional[int] = None,
) -> SplatCloud:
    """Build a device-resident SplatCloud from host arrays.

    ``opacities`` are post-sigmoid; ``scales`` are linear (post-exp); ``sh`` is
    (N, 16, 3) coeff-major RGB (degree<3 models zero-pad the tail).
    """
    n = means.shape[0]
    cap = capacity or n
    cap = max(PAD_MULTIPLE, -(-cap // PAD_MULTIPLE) * PAD_MULTIPLE)
    cov6 = build_covariance(scales, quats_xyzw)
    if np.ndim(upload_time) == 0:
        upload_time = np.full((n,), float(upload_time), np.float32)
    sh = np.asarray(sh, np.float32)
    if sh.shape[1] < 16:
        sh = np.pad(sh, ((0, 0), (0, 16 - sh.shape[1]), (0, 0)))
    return SplatCloud(
        means=jnp.asarray(_pad(np.asarray(means, np.float32), cap)),
        cov3d=jnp.asarray(_pad(cov6, cap)),
        opacity=jnp.asarray(_pad(np.asarray(opacities, np.float32), cap)),
        sh=jnp.asarray(_pad(sh, cap)),
        upload_time=jnp.asarray(_pad(np.asarray(upload_time, np.float32), cap)),
        num_splats=n,
    )


def mortonize(cloud: SplatCloud) -> SplatCloud:
    """Reorder a cloud along a 3D space-filling curve (host-side, one-time;
    Hilbert by default — ops/blocks.CURVE — for ~20% tighter brick boxes
    than the Morton Z-curve).

    Required by the fast render path (ops/blocks2.py): spatially local blocks
    project to tight tile rects. Rendering semantics are order-independent
    except for equal-depth16 tie-breaking (reference ties are GPU-race
    nondeterministic anyway — SURVEY.md §2.1). Padding slots stay at the tail.
    """
    from ..ops.blocks import order_splats
    n = cloud.num_splats
    order = order_splats(np.asarray(cloud.means)[:n])
    perm = np.arange(cloud.capacity)
    perm[:n] = order

    def r(a):
        return jnp.asarray(np.asarray(a)[perm])

    return SplatCloud(means=r(cloud.means), cov3d=r(cloud.cov3d),
                      opacity=r(cloud.opacity), sh=r(cloud.sh),
                      upload_time=r(cloud.upload_time), num_splats=n)


def fast_cloud_view(cloud: SplatCloud, planar_sh: bool = True) -> SplatCloud:
    """Render view of a cloud for the FAST path: SH cast once to bf16 (the
    48-coefficient f32 read dominates projection HBM traffic; band math
    upcasts on read) and, for the fused projection kernel, stored
    splat-minor (48, P) so the kernel-boundary transpose is a relabeling
    (it measured ~2.7 ms/frame as real data movement at the 5.8M/1080p
    headline). The original cloud keeps full precision for picking, state
    save and .ply export."""
    sh = cloud.sh.astype(jnp.bfloat16)
    if planar_sh and sh.ndim == 3:
        sh = sh.transpose(1, 2, 0).reshape(48, sh.shape[0])
    return dataclasses.replace(cloud, sh=sh)


def synthetic_scene(
    num_splats: int,
    seed: int = 0,
    extent: float = 4.0,
    scale_range: tuple = (0.005, 0.05),
    sh_degree: int = 3,
    surfaces: bool = False,
) -> SplatCloud:
    """Deterministic random scene for tests and benchmarks.

    The reference ships demo.ply (stripped from this checkout,
    .MISSING_LARGE_BLOBS:6); this stands in as the measurable workload.
    """
    rng = np.random.default_rng(seed)
    n = num_splats
    if surfaces:
        # Photogrammetry-like distribution: splats concentrate on ~2D surface
        # patches (walls/ground/foliage), matching how trained 3DGS models
        # (bicycle/garden) are structured — and what the reference's README
        # numbers were measured on. Uniform volumetric noise is a worst case
        # no real model exhibits.
        k = max(64, n // 4096)               # number of surface patches
        centers = rng.uniform(-extent, extent, (k, 3)).astype(np.float32)
        normals = rng.normal(size=(k, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        sizes = rng.uniform(0.15, 0.8, (k, 1)).astype(np.float32) * extent * 0.4
        u = rng.normal(size=(k, 3)).astype(np.float32)
        u -= (u * normals).sum(-1, keepdims=True) * normals
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        v = np.cross(normals, u)
        pid = rng.integers(0, k, n)
        a = rng.normal(size=(n, 1)).astype(np.float32)
        b = rng.normal(size=(n, 1)).astype(np.float32)
        c = rng.normal(0, 0.02, (n, 1)).astype(np.float32)  # surface thickness
        means = (centers[pid] + sizes[pid] * (a * u[pid] + b * v[pid])
                 + c * extent * normals[pid]).astype(np.float32)
        means = np.clip(means, -1.6 * extent, 1.6 * extent)
    else:
        means = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    # Push the cloud in front of the default camera (which looks down -Z from
    # the origin in the reference world, i.e. +Z in PLY frame after negation).
    means[:, 2] += extent * 1.5
    scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    if surfaces:
        # Trained 3DGS opacity is bimodal: most surface splats are near
        # opaque, a minority is wispy (this drives the reference's saturation
        # early-exit, gsplat_render.glsl:45-48).
        opac = np.where(rng.random(n) < 0.7,
                        rng.uniform(0.85, 1.0, n),
                        rng.uniform(0.05, 0.6, n)).astype(np.float32)
    else:
        opac = rng.uniform(0.2, 1.0, (n,)).astype(np.float32)
    ncoef = (sh_degree + 1) ** 2
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0] = rng.uniform(-1.0, 2.0, (n, 3))  # DC around mid-grey after the +0.5
    if ncoef > 1:
        sh[:, 1:ncoef] = rng.normal(0, 0.12, (n, ncoef - 1, 3))
    return from_arrays(means, scales, quats, opac, sh)


def photogrammetry_scene(
    num_splats: int,
    seed: int = 0,
    extent: float = 4.0,
) -> SplatCloud:
    """Scene with the marginal statistics of a TRAINED Inria 3DGS model.

    The reference's headline numbers come from real MipNeRF-360 checkpoints
    (bicycle/garden, /root/reference/README.md:26,58); its demo.ply is
    stripped from this checkout and the sandbox has no egress, so this
    reproduces the distributions a trained model exposes to the pipeline —
    the properties that actually stress each stage:

      * scales: LOG-NORMAL with a heavy upper tail (the Inria trainer stores
        log-scale and densifies/splits by gradient; survivors span ~4 orders
        of magnitude), strongly ANISOTROPIC per splat (thin plates along
        surfaces, needles along edges) — drives the big-splat (radius>=32px)
        extraction and the tile-rect distribution.
      * opacity: BIMODAL in logit space (training prunes alpha<0.005 and
        periodically resets opacity; converged splats saturate toward 1) —
        drives the saturation early-exit (gsplat_render.glsl:45-48).
      * layout: a well-observed central region with small dense surface
        splats + a sparse BACKGROUND SHELL of giant low-detail splats (sky /
        far field, the 360-capture signature) — the camera orbits INSIDE the
        scene, so far-plane depth16 quantization (depth^3 keys,
        gsplat_projection.glsl:218-226) is exercised.
      * SH: band energy decays geometrically from DC (higher bands encode
        view-dependent residuals only); channels are correlated (real
        radiance is mostly grey-ish at high bands).
    """
    rng = np.random.default_rng(seed)
    n = num_splats
    n_bg = max(1, int(n * 0.06))          # background shell (sky/far field)
    n_fol = max(1, int(n * 0.22))         # volumetric foliage / clutter
    n_surf = n - n_bg - n_fol             # surface patches

    # --- positions ---------------------------------------------------------
    k = max(64, n_surf // 4096)
    centers = rng.uniform(-extent, extent, (k, 3)).astype(np.float32)
    centers[:, 1] *= 0.35                 # flatten vertically (ground scene)
    normals = rng.normal(size=(k, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    sizes = (rng.uniform(0.15, 0.8, (k, 1)).astype(np.float32)
             * extent * 0.4)
    u = rng.normal(size=(k, 3)).astype(np.float32)
    u -= (u * normals).sum(-1, keepdims=True) * normals
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    v = np.cross(normals, u)
    pid = rng.integers(0, k, n_surf)
    a = rng.normal(size=(n_surf, 1)).astype(np.float32)
    b = rng.normal(size=(n_surf, 1)).astype(np.float32)
    c = rng.normal(0, 0.015, (n_surf, 1)).astype(np.float32)
    p_surf = (centers[pid] + sizes[pid] * (a * u[pid] + b * v[pid])
              + c * extent * normals[pid]).astype(np.float32)
    p_surf = np.clip(p_surf, -1.6 * extent, 1.6 * extent)

    p_fol = rng.normal(0, 0.55 * extent, (n_fol, 3)).astype(np.float32)
    p_fol[:, 1] = np.abs(p_fol[:, 1]) * 0.6  # above ground

    # background shell at 3-8x extent, roughly isotropic directions
    d_bg = rng.normal(size=(n_bg, 3)).astype(np.float32)
    d_bg /= np.linalg.norm(d_bg, axis=-1, keepdims=True)
    r_bg = rng.uniform(3.0, 8.0, (n_bg, 1)).astype(np.float32) * extent
    p_bg = (d_bg * r_bg).astype(np.float32)

    means = np.concatenate([p_surf, p_fol, p_bg], axis=0)

    # --- scales: log-normal, anisotropic -------------------------------------
    # base sigma per population: surfaces ~ 0.004*extent median, foliage a bit
    # larger, background giant (0.1-1 extent)
    ln = np.empty((n, 3), np.float32)
    base_s = rng.normal(np.log(0.004 * extent), 0.9, n_surf).astype(np.float32)
    base_f = rng.normal(np.log(0.009 * extent), 0.7, n_fol).astype(np.float32)
    base_b = rng.normal(np.log(0.25 * extent), 0.6, n_bg).astype(np.float32)
    base = np.concatenate([base_s, base_f, base_b])
    aniso = rng.normal(0, 0.55, (n, 3)).astype(np.float32)
    ln[:] = base[:, None] + aniso
    # plates: squash one random axis hard on ~45% (surfaces are locally 2D)
    plate = rng.random(n) < 0.45
    axis = rng.integers(0, 3, n)
    ln[plate, axis[plate]] -= rng.uniform(1.0, 2.5, plate.sum()).astype(
        np.float32)
    scales = np.exp(ln).astype(np.float32)
    # trainer clips: nothing smaller than ~1e-5 extent survives pruning
    scales = np.maximum(scales, 1e-5 * extent)

    # --- opacity: bimodal logit -----------------------------------------------
    m = rng.random(n)
    opac = np.where(
        m < 0.55, 1.0 - rng.exponential(0.04, n),      # converged, near 1
        np.where(m < 0.85, rng.uniform(0.10, 0.90, n), # mid
                 0.005 + rng.exponential(0.05, n)))    # wispy, above prune
    opac = np.clip(opac, 0.005, 0.9999).astype(np.float32)
    opac[n_surf + n_fol:] = np.clip(                   # sky is mostly opaque
        1.0 - rng.exponential(0.08, n_bg), 0.3, 0.9999).astype(np.float32)

    # --- orientation: plates align to their patch normal ----------------------
    quats = rng.normal(size=(n, 4)).astype(np.float32)

    # --- SH: geometric band decay, channel-correlated --------------------------
    sh = np.zeros((n, 16, 3), np.float32)
    # DC: natural palette (greens/browns/sky-blue mixture via per-population hue)
    dc_surf = rng.uniform(-0.8, 1.8, (n_surf, 3)).astype(np.float32)
    dc_fol = (rng.uniform(-0.5, 1.2, (n_fol, 1))
              * np.array([[0.6, 1.0, 0.5]], np.float32)
              + rng.normal(0, 0.15, (n_fol, 3))).astype(np.float32)
    dc_bg = (np.array([[0.4, 0.8, 1.6]], np.float32)
             + rng.normal(0, 0.25, (n_bg, 3))).astype(np.float32)
    sh[:, 0] = np.concatenate([dc_surf, dc_fol, dc_bg])
    grey = rng.normal(0, 1.0, (n, 15, 1)).astype(np.float32)
    chroma = rng.normal(0, 0.35, (n, 15, 3)).astype(np.float32)
    band_sigma = np.concatenate([
        np.full(3, 0.16), np.full(5, 0.07), np.full(7, 0.03)]).astype(
        np.float32)                                     # l=1,2,3 decay
    sh[:, 1:16] = (grey + chroma) * band_sigma[None, :, None]
    sh[n_surf + n_fol:, 1:16] *= 0.3                    # sky is low-detail

    return from_arrays(means, scales, quats, opac, sh)
