"""Checkpoint/save-load of engine state.

The reference has no persistence (SURVEY.md §5 "Checkpoint / resume: none");
its closest analogue is stateless re-init on model swap. Here: the
device-resident splat SoA plus the viewer state (camera pose, knobs) round-
trip through one .npz — cheap with jax.Array serialization, and an export
path (state → .ply) the reference lacks.
"""

from __future__ import annotations

import json

import numpy as np

from ..models.camera import Camera
from ..models.splats import SplatCloud
from .rasterizer import Rasterizer


def save_state(path: str, rasterizer: Rasterizer) -> None:
    cloud = rasterizer.cloud
    cam = rasterizer.camera
    meta = dict(
        num_splats=cloud.num_splats,
        model_scale=rasterizer.model_scale,
        render_scale=rasterizer.render_scale,
        heatmap=rasterizer.should_enable_heatmap,
        quality=rasterizer.quality,
        texture_size=list(rasterizer._cfg.target_size),
        fov_y=cam.fov_y, znear=cam.znear, zfar=cam.zfar,
    )
    np.savez_compressed(
        path,
        means=np.asarray(cloud.means), cov3d=np.asarray(cloud.cov3d),
        opacity=np.asarray(cloud.opacity), sh=np.asarray(cloud.sh),
        upload_time=np.asarray(cloud.upload_time),
        camera_position=cam.position, camera_basis=cam.basis,
        basis_override=rasterizer.basis_override,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    )


def load_state(path: str) -> Rasterizer:
    import jax.numpy as jnp
    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())
    cloud = SplatCloud(
        means=jnp.asarray(z["means"]), cov3d=jnp.asarray(z["cov3d"]),
        opacity=jnp.asarray(z["opacity"]), sh=jnp.asarray(z["sh"]),
        upload_time=jnp.asarray(z["upload_time"]),
        num_splats=int(meta["num_splats"]),
    )
    cam = Camera(position=z["camera_position"], basis=z["camera_basis"],
                 fov_y=meta["fov_y"], znear=meta["znear"], zfar=meta["zfar"])
    r = Rasterizer(cloud, texture_size=tuple(meta["texture_size"]),
                   camera=cam, quality=meta["quality"])
    r.model_scale = meta["model_scale"]
    r.render_scale = meta["render_scale"]
    r.should_enable_heatmap = meta["heatmap"]
    r.basis_override = np.asarray(z["basis_override"], np.float32)
    return r
