"""Configuration for the TPU gaussian-splatting rasterizer.

The reference keeps its tunables scattered across compile-time GLSL constants
(`gaussian_splatting_rasterizer.gd:4-8`, `gsplat_projection.glsl:23-27`), live
ImGui-bound state (`main.gd:49-68`) and Godot project settings. Here they are
promoted to one frozen dataclass (SURVEY.md §5 "Config / flag system").
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Compile-time constants of the reference pipeline
# (gaussian_splatting_rasterizer.gd:4-8, gsplat_projection.glsl:23-27).
TILE_SIZE = 16                  # pixels per tile edge (gsplat_render.glsl:8)
SORT_BUFFER_FACTOR = 10         # max duplicated keys = 10*N (gaussian_splatting_rasterizer.gd:79)
MIN_FACTOR = 255                # saturation early-exit threshold (gsplat_render.glsl:6)
MIN_ALPHA = 1.0 / MIN_FACTOR    # per-pixel transmittance cutoff (gsplat_render.glsl:7)
INVALID_KEY = 0xFFFFFFFF        # sort key sentinel for padded/culled slots (ours; the
                                # reference sizes its dispatch by an atomic counter instead)


@dataclasses.dataclass(frozen=True)
class RasterizerConfig:
    """Static configuration of a rasterizer instance.

    Everything here is a *compile-time* parameter of the jitted frame function;
    changing one re-traces. Live per-frame knobs (camera, model_scale, heatmap,
    time) are traced arguments instead — see `ops.pipeline.render_frame`.
    """

    # --- image ---
    width: int = 1920
    height: int = 1080
    render_scale: float = 1.0   # main.gd:51 slider 0.05-1.5; scales the render target

    # --- pipeline geometry ---
    # The reference's 16-px tiles (gsplat_render.glsl:8) are the default;
    # the FAST path measured best at tile_size=32 with batch_u=2 on v5e
    # (79.8 vs 125.5 ms at the 5.8M/1080p headline, round 4: 4x fewer
    # sequential kernel grid steps and smaller binning structures dominate
    # the extra per-tile candidate dilution; fidelity measured equal or
    # better). fast_defaults() applies that configuration; the exact path
    # stays at 16 for reference parity.
    tile_size: int = TILE_SIZE
    sort_buffer_factor: int = SORT_BUFFER_FACTOR
    # Static cap of tiles a single splat may touch in the jit pair-emission path.
    # The reference has no cap (dynamic atomic allocation); a splat overflowing the
    # cap keeps its closest tiles (row-major prefix of its rect). 32 tiles covers a
    # ~90x90px footprint; overflow is counted and reported via telemetry.
    max_tiles_per_splat: int = 32
    # Exact path: up to this many splats whose rect EXCEEDS the last tier of
    # exact_tiers are emitted densely over their full rect instead of being
    # truncated (ops/sort.py). At the 5.8M headline the cap-32 truncation
    # alone removed 1.7% of all pairs — a systematic luminance deficit the
    # reference (which never drops pairs) does not have. 0 disables. Splats
    # beyond this count still truncate at max_tiles_per_splat and land in
    # num_overflow.
    giant_splat_capacity: int = 256
    # Exact path: ((width, capacity), ...) ladder for splats whose rect
    # exceeds max_tiles_per_splat but doesn't need the full-screen giant
    # matrix: each is compacted into its tier's (capacity, width) dense
    # emission (ops/sort.py emit_and_sort). Sized so the 5.8M/1080p
    # headline emits with ZERO truncation at ~40% of the old (P, 32) + the
    # oracle's (P, 512) key-matrix cost. () disables (pre-round-5 layout).
    exact_tiers: Tuple[Tuple[int, int], ...] = ((128, 32768), (512, 4096))

    # --- model ---
    sh_degree: int = 3          # 0..3; degree<3 zero-pads coefficients (README.md:64)

    # --- fidelity / quirk switches (all default to exact reference behaviour) ---
    # Reproduce gsplat_boundaries.glsl:47-49: the bottom-right grid tile's range end
    # is set to sort_size-1 (drops one splat), and the highest-tile-id run present
    # in the sorted buffer is dropped unless it is that grid tile.
    reference_boundary_quirk: bool = True
    # Reproduce the Jacobian quirk at gsplat_projection.glsl:134-137 where
    # -focal.y (not -focal.x) multiplies mean.x in J[2][0].
    reference_jacobian_quirk: bool = True

    # --- performance knobs ---
    # "exact": per-tile compositing in exact sorted order (reference semantics).
    # "fast":  block-hierarchical pipeline + Pallas v3 kernel (ops/blocks2.py,
    #          ops/render_pallas3.py; >=48 dB PSNR vs exact on tests/golden).
    quality: str = "exact"
    # Use float32 for all rasterization math (required for the 1e-3 parity bar).
    dtype: str = "float32"
    # Fast path: lane capacity of the big-splat (radius >= 32 px) extraction;
    # None = auto (ops/blocks2.default_big_cap). Bigs beyond it stay in their
    # chains (order-degraded, never dropped).
    big_capacity: Optional[int] = None
    # Fast path: resident big lanes per render group (GROUP horizontally
    # contiguous tiles sharing one exact depth list, ops/bigbin.py; GROUP=1
    # measured optimal). Groups with more keep the CLOSEST lanes; the
    # dropped far tail is counted in FrameStats.num_overflow. Must be a
    # multiple of 128 (Mosaic DMA slices along lanes require 128 alignment).
    big_tile_capacity: int = 128
    # Fast path render kernel generation: "v3" (one tile per grid step,
    # ops/render_pallas3.py) or "v4" (lockstep_gt tiles composited in LOCKSTEP
    # per grid step — shared MXU issue slots and per-step fixed costs,
    # ops/render_pallas4.py). Identical ordering semantics.
    kernel: str = "v3"
    # Fast path: blocks per in-kernel batch (U). None = auto by tile size
    # (ops/render_pallas3.default_batch_u). Static shape knob: changing it
    # re-traces. The GS_BATCH_U env var overrides it for benchmark sweeps only.
    batch_u: Optional[int] = None
    # Fast path: the first slab_u batches of every tile's chain are
    # pre-gathered by XLA into one contiguous slab that Pallas auto-pipelines
    # (0 disables; the in-kernel DMA ring serves the tail either way).
    # Default 0 BY MEASUREMENT (round 4, 5.8M/1080p headline): the XLA slab
    # gather costs slightly more than the in-kernel DMA ring it replaces
    # (whole frame 136.7 ms with slab_u=2 vs 134.0 ms with 0) and holds a
    # ~534 MB intermediate alive. GS_SLAB_U env var overrides for sweeps.
    slab_u: int = 0
    # v4 kernel only: tiles composited in lockstep per grid step (VMEM
    # scratch scales with it; 4 ~= 11 MB). GS_GT env var overrides for
    # benchmark sweeps only.
    lockstep_gt: int = 4
    # Fast path: per-kernel Mosaic VMEM budget in MiB (None = the compiler's
    # default scoped limit, 16 MiB). tile_size/batch_u combinations whose
    # scratch exceeds the default (e.g. tile 32 x batch_u 4, tile 64) need
    # this raised; the physical per-core budget caps how far it can go.
    kernel_vmem_mb: Optional[int] = None
    # Fast path: run the whole per-splat projection + stage-1 operand packing
    # as ONE fused Pallas pass (ops/projection_pallas.py) instead of XLA's
    # ~15 separate loop fusions. Semantically equivalent (same formulas and
    # packing helpers; fp reassociation only). Static knob: changing it
    # re-traces.
    projection_kernel: bool = False
    # Fast path: ship the render kernel the (B, 8, S) u32 SORTED-WORD image
    # instead of the cooked (B, 16, S) f32 payload; the kernel unpacks
    # (integer-only f16 / rgb9e5 / bf16-pair) and evaluates power features
    # in-kernel per PROCESSED block (early exit leaves ~7% of binned blocks
    # live at the headline — XLA cooked every block plus a 372 MB/frame
    # payload write). Block meta and pair stats are bit-identical across
    # modes; pixels differ only by fp association in the feature math.
    # v3 kernel only. Static knob: changing it re-traces.
    words_payload: bool = False
    # Fast-path block clustering: "screen" re-clusters every frame with the
    # per-superblock (screen-cell Morton, depth16) row sort (ops/blocks2.py
    # stage 1); "bricks" cuts blocks from the STATIC load-time 3D Morton
    # order (compact world-space blobs -> naturally tight rects and depth
    # ranges for any camera), skipping the per-frame sort entirely — the
    # clustering is then temporally stable by construction. Static knob.
    cluster: str = "screen"

    @property
    def target_size(self) -> Tuple[int, int]:
        """Render target (width, height) after render_scale, min 1px.

        Mirrors the texture_size setter (gaussian_splatting_rasterizer.gd:26-29).
        """
        w = max(1, int(self.width * self.render_scale))
        h = max(1, int(self.height * self.render_scale))
        return (w, h)

    @property
    def tile_dims(self) -> Tuple[int, int]:
        """Tile grid (cols, rows) = ceil(target / tile_size)."""
        w, h = self.target_size
        t = self.tile_size
        return ((w + t - 1) // t, (h + t - 1) // t)

    @property
    def num_tiles(self) -> int:
        tx, ty = self.tile_dims
        return tx * ty

    def replace(self, **kw) -> "RasterizerConfig":
        return dataclasses.replace(self, **kw)

    def fast_defaults(self) -> "RasterizerConfig":
        """This config with quality='fast' and the device-measured fast-path
        performance knobs (rounds 4-5, v5e, 5.8M/1080p headline): tile_size
        32, batch_u 2 (79.8 ms/frame vs 125.5 at the reference's 16-px
        tiles, with equal-or-better fidelity, FIDELITY_r04.json), the fused
        Pallas projection kernel, static 3D-brick clustering (62.8 vs
        65.4 ms — no per-frame stage-1 sort, tighter depth ranges, and
        temporally stable by construction) and the in-kernel word-payload
        cook (61.0 ms combined; round-5 device A/B ladder 65.9 -> 65.4 ->
        64.8 -> 61.0). Knobs already set away from their dataclass defaults
        are respected."""
        kw = {"quality": "fast", "projection_kernel": True,
              "words_payload": self.kernel != "v4"}
        if self.tile_size == TILE_SIZE:
            kw["tile_size"] = 32
        if self.batch_u is None:
            kw["batch_u"] = 2
        if self.cluster == "screen":
            kw["cluster"] = "bricks"
        return dataclasses.replace(self, **kw)
