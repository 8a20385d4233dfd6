"""Stage 1: per-splat frustum cull + EWA covariance projection + SH color.

TPU-native equivalent of `gsplat_projection.glsl` (226 LoC, dispatched at
ceil(N/256)×256 threads, gaussian_splatting_rasterizer.gd:104). Here the whole
stage is one fused elementwise program over the padded splat axis — XLA maps it
onto the VPU with no kernel-launch or descriptor machinery. Compaction is NOT
done with an atomic counter (gsplat_projection.glsl:196); instead every splat
keeps its slot and carries a validity mask + tile count, and the sort stage
(ops/sort.py) turns that into the dense key stream.

All the reference's numeric quirks are reproduced (SURVEY.md §2.1):
  * 1.3×-margin frustum cull with z ∈ [0, w]        (gsplat_projection.glsl:160-166)
  * +0.3 covariance dilation                        (:141)
  * eigenvalue floor sqrt(max(0.1, …))              (:181)
  * -focal.y·mean.x Jacobian quirk                  (:134-137)
  * opacity^0.2 · 2.5σ biased splat radius          (:187-190)
  * depth16 = uint(ndc.z³ · 0xFFFF)                 (:218)
  * load fade-in animation (opacity/scale/slide)    (:87-90, 169-174, 185)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RasterizerConfig
from .sh import eval_sh_color


class ProjectedSplats(NamedTuple):
    """Per-splat outputs, one slot per input splat (no compaction).

    The reference's RasterizeData (gsplat_projection.glsl:42-48) plus the
    tile-rect/count needed for key emission and the validity mask that stands
    in for the early-return culls.
    """

    valid: jnp.ndarray       # (P,)  bool  — survived all culls
    image_pos: jnp.ndarray   # (P, 2) f32  — pixel-space gaussian center
    conic: jnp.ndarray       # (P, 3) f32  — inverse 2D covariance [c,-b,a]/det
    color: jnp.ndarray       # (P, 4) f32  — rgb + final opacity
    depth16: jnp.ndarray     # (P,)  u32  — quantized depth key (low 16 bits)
    rect: jnp.ndarray        # (P, 4) i32  — tile rect [x0, y0, x1, y1), clamped
    num_tiles: jnp.ndarray   # (P,)  i32  — tiles touched (0 if culled)
    radius: jnp.ndarray      # (P,)  f32  — opacity-biased splat radius (px)
    pos: jnp.ndarray         # (P, 3) f32  — model-scaled PLY-frame position (picking)


def ease_out_cubic(x: jnp.ndarray) -> jnp.ndarray:
    """gsplat_projection.glsl:87-90."""
    a = 1.0 - x
    return 1.0 - a * a * a


def project_splats(
    means: jnp.ndarray,        # (P, 3)
    cov3d: jnp.ndarray,        # (P, 6) upper tri [xx,xy,xz,yy,yz,zz]
    opacity: jnp.ndarray,      # (P,)
    sh: jnp.ndarray,           # (P, 16, 3)
    upload_time: jnp.ndarray,  # (P,)
    view: jnp.ndarray,         # (4, 4) world(PLY)→view
    proj: jnp.ndarray,         # (4, 4)
    camera_pos: jnp.ndarray,   # (3,) PLY frame
    model_scale: jnp.ndarray,  # scalar
    time: jnp.ndarray,         # scalar seconds
    cfg: RasterizerConfig,
) -> ProjectedSplats:
    f32 = jnp.float32
    w, h = cfg.target_size
    gx, gy = cfg.tile_dims
    dims = jnp.array([w, h], f32)

    # --- world/view/clip transforms (gsplat_projection.glsl:160-162) ---
    splat_pos = means * model_scale
    vp = splat_pos @ view[:3, :3].T + view[:3, 3]          # (P, 3) view space
    clip = vp @ proj[:3, :3].T + proj[:3, 3]               # rows 0..2
    clip_w = vp @ proj[3, :3] + proj[3, 3]                 # row 3

    # --- frustum cull, 1.3× margin, z ∈ [0, w] (:163-166) ---
    bound = clip_w * 1.2
    inside = (
        (clip[:, 0] >= -bound) & (clip[:, 0] <= bound)
        & (clip[:, 1] >= -bound) & (clip[:, 1] <= bound)
        & (clip[:, 2] >= 0.0) & (clip[:, 2] <= clip_w)
    )

    # --- load fade-in animation (:169-174) ---
    st = time - upload_time
    tf = ease_out_cubic(jnp.clip(st, 0.0, 1.0))
    tfl = ease_out_cubic(jnp.clip(st - 0.35, 0.0, 1.0))
    splat_opacity = opacity * tfl * tfl
    splat_scale = model_scale * (2.0 - tfl)                # mix(2,1,tfl)

    # --- EWA 2D covariance (project_covariance, :124-142) ---
    c3 = cov3d * (splat_scale * splat_scale)[:, None]
    tan_fov_inv = jnp.stack([proj[0, 0], proj[1, 1]])
    focal = dims * 0.5 * tan_fov_inv
    tan_fov = 1.0 / tan_fov_inv
    z_inv = 1.0 / vp[:, 2]
    fzx = focal[0] * z_inv
    fzy = focal[1] * z_inv
    mx = jnp.clip(vp[:, 0] * z_inv, -tan_fov[0] * 1.3, tan_fov[0] * 1.3)
    my = jnp.clip(vp[:, 1] * z_inv, -tan_fov[1] * 1.3, tan_fov[1] * 1.3)

    # J columns (GLSL col-major mat3 at :134-137). The quirk: J[2][0] uses
    # -focal.y (not -focal.x). B = inv_view · J with inv_view = R_viewᵀ.
    jq = fzy if cfg.reference_jacobian_quirk else fzx
    Rv = view[:3, :3]                                      # view rotation
    # B[:, 0] = Rvᵀ @ (fzx, 0, -jq·mx);  B[:, 1] = Rvᵀ @ (0, fzy, -fzy·my)
    b0 = (Rv[0] * fzx[:, None]) + (Rv[2] * (-jq * mx)[:, None])     # (P, 3)
    b1 = (Rv[1] * fzy[:, None]) + (Rv[2] * (-fzy * my)[:, None])    # (P, 3)

    # cov2d = Bᵀ Σ B, Σ from upper triangle.
    xx, xy, xz = c3[:, 0], c3[:, 1], c3[:, 2]
    yy, yz, zz = c3[:, 3], c3[:, 4], c3[:, 5]

    def sigma_dot(v):  # Σ v for v: (P, 3)
        return jnp.stack([
            xx * v[:, 0] + xy * v[:, 1] + xz * v[:, 2],
            xy * v[:, 0] + yy * v[:, 1] + yz * v[:, 2],
            xz * v[:, 0] + yz * v[:, 1] + zz * v[:, 2],
        ], axis=-1)

    s0 = sigma_dot(b0)
    cov_a = jnp.sum(b0 * s0, axis=-1) + 0.3                # +0.3 dilation (:141)
    cov_b = jnp.sum(b1 * s0, axis=-1)
    cov_c = jnp.sum(b1 * sigma_dot(b1), axis=-1) + 0.3

    det = cov_a * cov_c - cov_b * cov_b
    nonsingular = det != 0.0                               # (:177-178)

    mid = 0.5 * (cov_a + cov_c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))     # (:181)
    lam1 = mid + disc
    lam2 = mid - disc
    eig_ok = (lam1 >= 0.0) & (lam2 >= 0.0)                 # (:182)

    # --- image position with load slide-in (:184-185) ---
    safe_w = jnp.where(clip_w == 0, 1.0, clip_w)
    ndc = clip / safe_w[:, None]
    shift = jnp.stack([1.0 - tf, 0.75 * (1.0 - tf)], axis=-1)
    image_pos = ((ndc[:, :2] + 1.0) * 0.5 - shift) * (dims - 1.0)

    # --- opacity-biased radius and tile rect (:187-194) ---
    radius = jnp.power(jnp.maximum(splat_opacity, 0.0), 0.2) * 2.5 * jnp.sqrt(
        jnp.maximum(lam1, lam2))
    ts = float(cfg.tile_size)
    grid = jnp.array([gx, gy], f32)
    lo = jnp.clip((image_pos - radius[:, None]) / ts, 0.0, grid).astype(jnp.int32)
    hi = jnp.clip(jnp.ceil((image_pos + radius[:, None]) / ts), 0.0, grid
                  ).astype(jnp.int32)
    nt = jnp.maximum(hi[:, 0] - lo[:, 0], 0) * jnp.maximum(hi[:, 1] - lo[:, 1], 0)

    valid = inside & nonsingular & eig_ok & (nt > 0)
    nt = jnp.where(valid, nt, 0)

    # --- depth key: ndc.z³ quantized to 16 bits (:218) ---
    # Clamped to 0xFFFE: 0xFFFF is reserved as the invalid/padding sentinel
    # throughout the fast path (a far-plane-edge splat quantizing to 0xFFFF
    # would otherwise collide with padding and be silently dropped by
    # binning). Affects only exact far-plane ties, below any pixel tolerance.
    z3 = ndc[:, 2] * ndc[:, 2] * ndc[:, 2]
    depth16 = jnp.minimum(
        (z3 * f32(0xFFFF)).astype(jnp.uint32) & jnp.uint32(0xFFFF),
        jnp.uint32(0xFFFE))

    # --- SH color (:198-203) ---
    vd = splat_pos - camera_pos
    vd = vd / jnp.maximum(jnp.linalg.norm(vd, axis=-1, keepdims=True), 1e-12)
    rgb = eval_sh_color(vd, sh, cfg.sh_degree)
    color = jnp.concatenate([rgb, splat_opacity[:, None]], axis=-1)

    # conic = inverse 2D covariance, stored [c, -b, a]/det (:202)
    safe_det = jnp.where(det == 0, 1.0, det)
    conic = jnp.stack([cov_c, -cov_b, cov_a], axis=-1) / safe_det[:, None]

    return ProjectedSplats(
        valid=valid,
        image_pos=image_pos,
        conic=conic,
        color=color,
        depth16=depth16,
        rect=jnp.concatenate([lo, hi], axis=-1),
        num_tiles=nt,
        radius=radius,
        pos=splat_pos,
    )
