#!/usr/bin/env python
"""Device-scale fidelity: fast path vs the exact oracle at the 5.8M/1080p
headline (VERDICT round-2 item #4).

Measurement design (what round 3's isolation probes established):

  * The exact oracle must run with a RAISED `max_tiles_per_splat`: at the
    default 32 it truncates ~316K pairs (1.7%) of wide splats that the fast
    path's big lanes composite in full — at cap 32 the ORACLE is the wrong
    image (a systematic -0.012 luminance deficit that cost ~10 dB in the
    round-2 artifact). The cap costs no memory (emission is a fori_loop of
    masked scatters, ops/sort.py), only exact-frame runtime.
  * PSNR is reported on TWO scenes: the benchmark scene (per-splat
    uniform-random DC color — adversarial: every residual ordering
    difference is maximally visible) and a correlated-color variant
    (DC = smooth function of position — realistic statistics).
  * Each scene also reports the exact-vs-exact-REVERSED-input PSNR: the
    reference's own tie-order nondeterminism envelope (its GPU radix sort
    races on equal (tile,depth16) keys, SURVEY.md §2.1). On the adversarial
    scene this envelope is ~27 dB — no faithful renderer can exceed it
    there, so fast-path numbers must be read against it.

Writes FIDELITY_r{N}.json at the repo root and PNG pairs to /tmp.

Usage: python benchmarks/fidelity_headline.py [n_splats] [obig,obig,...]
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_v3 import get_cloud  # noqa: E402

ORACLE_TILE_CAP = 512   # max_tiles_per_splat for the oracle (leftover
                        # truncation is reported as oracle_pair_overflow)


def correlated_colors(cloud):
    """Replace per-splat random DC color by a smooth function of position."""
    import jax.numpy as jnp
    m = np.asarray(cloud.means)
    dc = 0.5 + 0.45 * np.stack([
        np.sin(1.3 * m[:, 0]) * np.cos(0.7 * m[:, 2]),
        np.sin(1.1 * m[:, 1] + 2.0),
        np.cos(0.9 * m[:, 0] + 0.5 * m[:, 1]),
    ], axis=1).astype(np.float32)
    sh = np.zeros_like(np.asarray(cloud.sh))
    sh[:, 0] = dc
    return dataclasses.replace(cloud, sh=jnp.asarray(sh))


def reverse_cloud(cloud):
    """Reverse the valid splat prefix (padding stays at the tail)."""
    nsp = cloud.num_splats
    perm = np.arange(cloud.capacity)
    perm[:nsp] = perm[:nsp][::-1]
    return dataclasses.replace(
        cloud,
        means=cloud.means[perm], cov3d=cloud.cov3d[perm],
        opacity=cloud.opacity[perm], sh=cloud.sh[perm],
        upload_time=cloud.upload_time[perm])


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import godotgaussiansplatting_tpu as gs
    from godotgaussiansplatting_tpu.ops.pipeline import (make_uniforms,
                                                         render_frame)
    from godotgaussiansplatting_tpu.ops.fast_pipeline import render_frame_fast
    from godotgaussiansplatting_tpu.utils.image import hwc, write_png

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_800_000
    # fast variants: "tile_size:obig" pairs (argv[2] or GS_FID_CONFIGS)
    spec = (sys.argv[2] if len(sys.argv) > 2
            else os.environ.get("GS_FID_CONFIGS", "16:128,32:128,32:256"))
    variants = [tuple(int(x) for x in v.split(":")) for v in spec.split(",")]
    cfg = gs.RasterizerConfig(width=1920, height=1080, quality="fast")
    print(f"{n} splats @1920x1080, fast variants {variants},",
          jax.default_backend(), flush=True)
    base_cloud = get_cloud(n)
    cam = gs.orbit_trajectory(1, radius=5.0, target=(0, 0, 6.0))[0]
    uni = make_uniforms(cam, cfg)
    results = {"n_splats": n, "resolution": "1920x1080",
               "oracle_max_tiles_per_splat": ORACLE_TILE_CAP, "scenes": {}}

    # Round 5: the oracle keeps the default base cap and covers wide
    # splats through the exact_tiers ladder (ops/sort.py) instead of a
    # global max_tiles_per_splat raise — the old (P, 512) key build made
    # the oracle a 44.8 s/frame affair (FIDELITY_r04). Caps sized ~4x the
    # measured wide-splat population at the headline; any shortfall shows
    # up as oracle_pair_overflow, which gates below.
    xcfg = cfg.replace(quality="exact",
                       exact_tiers=((128, 131072), (ORACLE_TILE_CAP, 16384)),
                       giant_splat_capacity=1024)
    exact_jit = jax.jit(lambda c, u: (lambda o: (
        o.image, o.stats.num_pairs, o.stats.num_overflow))(
            render_frame(c, u, xcfg, tile_capacity=8192)))

    @jax.jit
    def psnr(a, b):
        mse = jnp.mean((a[..., :3] - b[..., :3]) ** 2)
        return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

    for scene in ("bench", "corr"):
        cloud = base_cloud if scene == "bench" else correlated_colors(
            base_cloud)
        r = {}
        t0 = time.perf_counter()
        img_x, npairs, novf = exact_jit(cloud, uni)
        img_exact = np.asarray(img_x)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        img_exact = np.asarray(exact_jit(cloud, uni)[0])
        r["exact_frame_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        r["exact_first_s"] = round(t_first, 1)
        r["oracle_pairs"] = int(np.asarray(npairs))
        r["oracle_pair_overflow"] = int(np.asarray(novf))
        assert r["oracle_pair_overflow"] == 0, (
            "oracle truncated pairs - raise the exact_tiers caps")
        print(f"[{scene}] exact: steady {r['exact_frame_ms']:.0f} ms, "
              f"pair overflow {r['oracle_pair_overflow']}", flush=True)

        img_rev = np.asarray(exact_jit(reverse_cloud(cloud), uni)[0])
        r["tie_envelope_db"] = round(float(np.asarray(
            psnr(jnp.asarray(img_rev), jnp.asarray(img_exact)))), 2)
        print(f"[{scene}] exact-rev tie envelope: "
              f"{r['tie_envelope_db']} dB", flush=True)
        write_png(f"/tmp/fidelity_{scene}_exact.png", img_exact)

        r["fast"] = []
        for ts, ob in variants:
            fcfg = cfg.replace(tile_size=ts,
                               batch_u=2 if ts == 32 else None,
                               projection_kernel=True)
            fast_jit = jax.jit(lambda c, u, fcfg=fcfg, ob=ob: (
                lambda o: (o.image, o.stats.num_overflow))(
                    render_frame_fast(c, u, fcfg, obig=ob)))
            t0 = time.perf_counter()
            img_f, ovf = fast_jit(cloud, uni)
            img_fast = hwc(np.asarray(img_f))   # planar -> (H, W, 4) view
            t_c = time.perf_counter() - t0
            p = float(np.asarray(psnr(jnp.asarray(img_fast),
                                      jnp.asarray(img_exact))))
            entry = {"tile_size": ts, "obig": ob, "psnr_db": round(p, 2),
                     "num_overflow": int(np.asarray(ovf)),
                     "first_s": round(t_c, 1)}
            r["fast"].append(entry)
            print(f"[{scene}] fast ts={ts} obig={ob}: PSNR {p:.2f} dB, "
                  f"overflow {entry['num_overflow']}", flush=True)
            write_png(f"/tmp/fidelity_{scene}_fast_ts{ts}_obig{ob}.png",
                      img_fast)
        results["scenes"][scene] = r

    out_path = os.path.join(os.path.dirname(__file__), "..",
                            "FIDELITY_r05.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
