"""godotgaussiansplatting_tpu — a TPU-native 3D Gaussian Splatting engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of the Godot/Vulkan
viewer 2Retr0/GodotGaussianSplatting (reference mounted at /root/reference,
analyzed in SURVEY.md): arbitrary Inria-format .ply splat models rendered
through a fully device-resident four-stage tile pipeline — projection →
key sort → tile boundaries → per-tile alpha compositing — plus camera model,
picking, heatmap, telemetry and multi-chip sharding.
"""

from .config import RasterizerConfig, TILE_SIZE, SORT_BUFFER_FACTOR
from .models.camera import Camera, orbit_trajectory
from .models.splats import (SplatCloud, from_arrays, mortonize,
                            photogrammetry_scene, synthetic_scene)
from .ops.pipeline import (FrameOutput, FrameStats, FrameUniforms,
                           make_uniforms, pick_splat_position, render_frame,
                           render_frame_jit, render_multiview)
from .engine.rasterizer import Rasterizer

__version__ = "0.1.0"

__all__ = [
    "RasterizerConfig", "TILE_SIZE", "SORT_BUFFER_FACTOR",
    "Camera", "orbit_trajectory",
    "SplatCloud", "from_arrays", "mortonize", "synthetic_scene",
    "photogrammetry_scene",
    "FrameOutput", "FrameStats", "FrameUniforms", "make_uniforms",
    "render_frame", "render_frame_jit", "render_multiview",
    "pick_splat_position", "Rasterizer",
    "__version__",
]
