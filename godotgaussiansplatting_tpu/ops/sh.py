"""Spherical-harmonic color evaluation (degrees 0-3, Inria sign convention).

Reproduces `get_color` in gsplat_projection.glsl:94-121: the standard SH
constants, the alternating signs, and the final max(0, 0.5 + Σ) clamp.
Vectorized over splats; runs on the VPU as one fused elementwise chain.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, 1.0925484305920792, 0.31539156525252005,
         1.0925484305920792, 0.5462742152960396)
SH_C3 = (0.5900435899266435, 2.890611442640554, 0.4570457994644658,
         0.3731763325901154, 0.4570457994644658, 1.445305721320277,
         0.5900435899266435)


def eval_sh_color(view_dir: jnp.ndarray, sh: jnp.ndarray, degree: int = 3) -> jnp.ndarray:
    """RGB from SH coefficients and per-splat view directions.

    view_dir: (N, 3) normalized (splat_pos - camera_pos), PLY frame
              (gsplat_projection.glsl:198).
    sh:       (N, 16, 3) coefficients, coeff-major RGB.
    degree:   0..3; lower degrees skip the higher bands entirely (the
              reference hardcodes 3, README.md:64 — degree is a config knob
              here for BASELINE config 1's SH-0 run).
    Returns (N, 3) linear RGB, clamped at 0 (gsplat_projection.glsl:100).
    """
    # bf16 coefficient arrays are accepted (the fast path keeps a resident
    # half-precision SH copy — its 1.1 GB f32 read dominates projection HBM
    # traffic at 5.8M splats). Each band coefficient is SLICED from the
    # bf16 array and upcast individually: a whole-array astype up front
    # measured as a separately materialized f32[5.8M,16,3] convert at the
    # headline (+3.8 ms convert + 2.5 ms consumer, a 1.1 GB HBM round-trip
    # XLA did not fuse into the chain); per-slice converts do fuse. Band
    # math still accumulates in f32.
    def co(k):
        return sh[:, k].astype(jnp.float32)

    x = view_dir[:, 0:1]
    y = view_dir[:, 1:2]
    z = view_dir[:, 2:3]
    c = 0.5 + co(0) * SH_C0
    if degree >= 1:
        c = (c
             - co(1) * (SH_C1 * y)
             + co(2) * (SH_C1 * z)
             - co(3) * (SH_C1 * x))
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        c = (c
             + co(4) * (SH_C2[0] * xy)
             - co(5) * (SH_C2[1] * yz)
             + co(6) * (SH_C2[2] * (2.0 * zz - xx - yy))
             - co(7) * (SH_C2[3] * xz)
             + co(8) * (SH_C2[4] * (xx - yy)))
    if degree >= 3:
        c = (c
             - co(9) * (SH_C3[0] * y * (3.0 * xx - yy))
             + co(10) * (SH_C3[1] * x * yz)
             - co(11) * (SH_C3[2] * y * (4.0 * zz - xx - yy))
             + co(12) * (SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy))
             - co(13) * (SH_C3[4] * x * (4.0 * zz - xx - yy))
             + co(14) * (SH_C3[5] * z * (xx - yy))
             - co(15) * (SH_C3[6] * x * (xx - 3.0 * yy)))
    return jnp.maximum(c, 0.0)
