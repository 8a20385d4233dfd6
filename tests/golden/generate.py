#!/usr/bin/env python
"""Generate the golden-image corpus (VERDICT round-1 item #9).

Builds a small deterministic Inria-convention .ply exercising the quirk
stack — SH degree 3, big splats (radius >= BIG_RADIUS segregation), deep
translucent depth stacks (ordering-sensitive), bimodal opacity — renders it
with the exact pipeline (ops/render.py, the semantics oracle that follows
gsplat_render.glsl's globally sorted traversal) from three cameras, and
commits scene.ply + view*.png + meta.json.

Regenerate with:  python tests/golden/generate.py
(runs on CPU; output is deterministic for a fixed jax/numpy version — the
test comparison allows 2 LSB of drift.)
"""

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, ROOT)

HERE = os.path.dirname(os.path.abspath(__file__))
SIZE = 256
TILE_CAPACITY = 3072


def build_scene_arrays():
    """Deterministic raw splat arrays (pre-activation convention)."""
    rng = np.random.default_rng(1234)

    # -- surface patches (photogrammetry-like), SH3 --------------------------
    n_surf = 7000
    k = 24
    extent = 3.0
    centers = rng.uniform(-extent, extent, (k, 3)).astype(np.float32)
    normals = rng.normal(size=(k, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    sizes = rng.uniform(0.3, 1.1, (k, 1)).astype(np.float32)
    u = rng.normal(size=(k, 3)).astype(np.float32)
    u -= (u * normals).sum(-1, keepdims=True) * normals
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    v = np.cross(normals, u)
    pid = rng.integers(0, k, n_surf)
    a = rng.normal(size=(n_surf, 1)).astype(np.float32)
    b = rng.normal(size=(n_surf, 1)).astype(np.float32)
    c = rng.normal(0, 0.05, (n_surf, 1)).astype(np.float32)
    means_s = (centers[pid] + sizes[pid] * (a * u[pid] + b * v[pid])
               + c * normals[pid]).astype(np.float32)
    scales_s = rng.uniform(0.01, 0.06, (n_surf, 3)).astype(np.float32)
    opac_s = np.where(rng.random(n_surf) < 0.7,
                      rng.uniform(0.85, 1.0, n_surf),
                      rng.uniform(0.05, 0.6, n_surf)).astype(np.float32)

    # -- big splats: exercise radius >= BIG_RADIUS segregation ---------------
    n_big = 40
    means_b = rng.uniform(-extent, extent, (n_big, 3)).astype(np.float32)
    scales_b = rng.uniform(0.5, 1.4, (n_big, 3)).astype(np.float32)
    opac_b = rng.uniform(0.08, 0.35, n_big).astype(np.float32)

    # -- translucent depth stacks: ordering-sensitive columns ----------------
    # 12 columns of 40 splats each, tightly stacked in depth with alternating
    # saturated colors; any blend-order error shifts the resulting hue.
    n_cols, per_col = 12, 40
    cx = rng.uniform(-1.5, 1.5, (n_cols, 1)).astype(np.float32)
    cy = rng.uniform(-1.5, 1.5, (n_cols, 1)).astype(np.float32)
    zs = np.linspace(-0.8, 0.8, per_col, dtype=np.float32)[None, :]
    means_d = np.stack([
        np.broadcast_to(cx, (n_cols, per_col))
        + rng.normal(0, 0.01, (n_cols, per_col)).astype(np.float32),
        np.broadcast_to(cy, (n_cols, per_col))
        + rng.normal(0, 0.01, (n_cols, per_col)).astype(np.float32),
        np.broadcast_to(zs, (n_cols, per_col)),
    ], axis=-1).reshape(-1, 3).astype(np.float32)
    n_stack = n_cols * per_col
    scales_d = rng.uniform(0.05, 0.12, (n_stack, 3)).astype(np.float32)
    opac_d = rng.uniform(0.25, 0.5, n_stack).astype(np.float32)

    means = np.concatenate([means_s, means_b, means_d])
    scales = np.concatenate([scales_s, scales_b, scales_d])
    opac = np.concatenate([opac_s, opac_b, opac_d])
    n = means.shape[0]
    means[:, 2] += extent * 1.6            # push in front of the reset camera

    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)

    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0] = rng.uniform(-0.8, 1.8, (n, 3))
    sh[:, 1:] = rng.normal(0, 0.15, (n, 15, 3))      # full SH3 bands
    # Saturated alternating stack colors (DC only, strong):
    stack_dc = np.where((np.arange(n_stack) % 2)[:, None] == 0,
                        np.array([[2.0, -0.6, -0.6]], np.float32),
                        np.array([[-0.6, -0.6, 2.0]], np.float32))
    sh[n - n_stack:, 0] = stack_dc
    return means, scales, quats, opac, sh


def cameras():
    from godotgaussiansplatting_tpu.models.camera import Camera
    cam0 = Camera.reset_pose()
    cam1 = Camera.reset_pose().with_yaw_pitch(150.0, -20.0)
    cam1.position = np.array([1.5, 1.8, -2.0], np.float32)
    cam2 = Camera(position=np.array([-3.0, 0.5, -9.5], np.float32)).look_at(
        np.array([0.0, 0.0, -4.8], np.float32))
    return [cam0, cam1, cam2]


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.models.ply import write_ply, load_splats
    from godotgaussiansplatting_tpu.utils.image import write_png

    means, scales, quats, opac, sh = build_scene_arrays()
    ply_path = os.path.join(HERE, "scene.ply")
    write_ply(ply_path, means, scales, quats, opac, sh)
    print(f"wrote {ply_path}: {means.shape[0]} splats, "
          f"{os.path.getsize(ply_path)/1e6:.2f} MB")

    cloud = load_splats(ply_path, upload_time=-1e9)
    # max_tiles_per_splat=256 (= the full 16x16 grid): the big splats cover
    # most of the screen up close, and the corpus must be truncation-free.
    cfg = gs.RasterizerConfig(width=SIZE, height=SIZE,
                              max_tiles_per_splat=256)
    for i, cam in enumerate(cameras()):
        uni = gs.make_uniforms(cam, cfg)
        out = gs.render_frame_jit(cloud, uni, cfg,
                                  tile_capacity=TILE_CAPACITY)
        assert int(out.stats.num_overflow) == 0, (
            f"view{i}: overflow — raise TILE_CAPACITY")
        img = np.asarray(out.image)
        path = os.path.join(HERE, f"view{i}.png")
        write_png(path, img)
        print(f"wrote view{i}.png  (pairs={int(out.stats.num_pairs)}, "
              f"max_tile={int(out.stats.max_tile_count)})")

    with open(os.path.join(HERE, "meta.json"), "w") as f:
        json.dump({
            "size": SIZE, "tile_capacity": TILE_CAPACITY,
            "num_splats": int(means.shape[0]),
            "note": "exact-mode renders; cameras defined in generate.py",
        }, f, indent=1)


if __name__ == "__main__":
    main()
