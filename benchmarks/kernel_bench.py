#!/usr/bin/env python
"""Render-kernel microbenchmark: drives ops/render_pallas.py alone with
synthetic block data shaped like the 5.8M-splat 1080p frame (45K blocks,
~100 covering blocks/tile), so kernel variants can be iterated without the
3-minute full-pipeline compile.

Usage: python benchmarks/kernel_bench.py [blocks_per_tile]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from godotgaussiansplatting_tpu.config import RasterizerConfig
    from godotgaussiansplatting_tpu.ops.blocks import BLOCK_SIZE, PAYLOAD_WIDTH
    from godotgaussiansplatting_tpu.ops.render_pallas import (
        render_tiles_pallas)

    nb_per_tile = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = RasterizerConfig(width=1920, height=1080)
    gx, gy = cfg.tile_dims
    T = gx * gy
    B = 45_312
    S = BLOCK_SIZE
    rng = np.random.default_rng(0)

    # Synthetic blocks: each block belongs to a home tile; members scatter
    # around it with plausible conics/opacities, depth-sorted.
    home = rng.integers(0, T, B)
    hx = (home % gx) * 16 + 8
    hy = (home // gx) * 16 + 8
    pay = np.zeros((B, PAYLOAD_WIDTH, S), np.float32)
    pay[:, 0] = hx[:, None] + rng.normal(0, 18, (B, S))
    pay[:, 1] = hy[:, None] + rng.normal(0, 18, (B, S))
    inv_var = 1.0 / rng.uniform(2.0, 40.0, (B, 1)) ** 1
    pay[:, 2] = inv_var
    pay[:, 3] = 0.0
    pay[:, 4] = inv_var
    pay[:, 5:8] = rng.uniform(0, 1, (B, 3, S))
    pay[:, 8] = np.where(rng.random((B, S)) < 0.7,
                         rng.uniform(0.85, 1.0, (B, S)),
                         rng.uniform(0.05, 0.6, (B, S)))
    pay[:, 9] = np.sort(rng.uniform(0, 65535, (B, S)), axis=1)
    pay[:, 10] = rng.uniform(4, 14, (B, S))

    tile_blocks = rng.integers(0, B, (T, 256)).astype(np.int32)
    tile_nblocks = np.full(T, nb_per_tile, np.int32)
    tile_cands = tile_nblocks * S

    args = [jnp.asarray(a) for a in
            (pay, tile_blocks, tile_nblocks, tile_cands)]
    hm = jnp.float32(0.0)

    fn = jax.jit(lambda p, tb, nb, tc: render_tiles_pallas(
        p, tb, nb, tc, hm, cfg))
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out[0, 0, 0])
    print(f"compile+run {time.perf_counter()-t0:.1f}s")

    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    pairs = int(tile_nblocks.sum())
    print(f"render: {dt*1e3:.1f} ms for {pairs} tile-block pairs "
          f"({dt/pairs*1e9:.0f} ns/pair, "
          f"{pairs*S*256/dt/1e9:.1f} G pixel-splat/s)")


if __name__ == "__main__":
    main()
