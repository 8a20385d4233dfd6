"""Async streaming splat upload: host .ply → device SoA, chunk by chunk.

Equivalent of `PlyFile.load_gaussian_splats` (ply_file.gd:28-77): the
reference fans ~1000 chunks over a worker pool, each swizzling and
`buffer_update`-ing into the live GPU buffer while frames render, with an
atomic progress counter, a cancel flag and a completion callback; the chunk
upload timestamp drives the per-splat fade-in.

TPU mapping: the device SoA is preallocated; each chunk lands via a
donated-argument `dynamic_update_slice` jit (an in-place HBM write — the
`buffer_update` analogue). Swizzle is vectorized NumPy (or the native C++
loader) instead of a scalar loop, so far fewer chunks are needed.
"""

from __future__ import annotations

import functools
import threading
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ply as plyio
from ..models.splats import PAD_MULTIPLE, SplatCloud, build_covariance


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_chunk(buf, upd, start):
    # buf is DONATED: XLA aliases input to output, so each chunk write is
    # O(chunk), not a full-SoA copy (at the 5.8M headline the SoA is
    # ~1.6 GB; 64 chunk writes copying it would move ~100 GB). The donated
    # handle (the previous cloud's array) is dead afterwards — consumers
    # synchronize via StreamingLoader.write_lock before dispatching frames.
    return jax.lax.dynamic_update_slice_in_dim(buf, upd, start, axis=0)


class StreamingLoader:
    """Loads a parsed PLY into a live SplatCloud from a background thread.

    API mirrors the reference loader's observable surface:
      num_splats_loaded — atomic progress counter (ply_file.gd:72-74)
      cancel()          — should_terminate flag (ply_file.gd:35,70)
      on_loaded         — completion callback == the `loaded` signal
      cloud             — the live, partially-filled SplatCloud
    """

    def __init__(
        self,
        ply: plyio.PlyFile,
        chunks: int = 64,
        on_loaded: Optional[Callable[[], None]] = None,
        time_fn: Callable[[], float] = time.monotonic,
        morton: bool = False,
    ):
        self._ply = ply
        self._morton = morton
        self._chunks = max(1, min(chunks, ply.size))
        self._on_loaded = on_loaded
        self._time_fn = time_fn
        self._cancel = False
        self._lock = threading.Lock()
        # Held while a chunk write donates the previous cloud's buffers;
        # frame dispatchers take it while grabbing self.cloud AND enqueueing
        # work on it, so they never dispatch on a donated (deleted) array.
        # The reference instead writes the live GPU buffer mid-frame by
        # design (ply_file.gd:34-76's accepted race); device-side in-order
        # execution gives us the same overlap without the hazard.
        self.write_lock = threading.RLock()
        self.num_splats_loaded = 0

        n = ply.size
        cap = max(PAD_MULTIPLE, -(-n // PAD_MULTIPLE) * PAD_MULTIPLE)
        self.cloud = SplatCloud(
            means=jnp.zeros((cap, 3), jnp.float32),
            cov3d=jnp.zeros((cap, 6), jnp.float32),
            opacity=jnp.zeros((cap,), jnp.float32),
            sh=jnp.zeros((cap, 16, 3), jnp.float32),
            upload_time=jnp.zeros((cap,), jnp.float32),
            num_splats=n,
        )
        self._thread: Optional[threading.Thread] = None

    # -- control -----------------------------------------------------------

    def start(self) -> "StreamingLoader":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def cancel(self) -> None:
        self._cancel = True

    def join(self, timeout=None) -> None:
        if self._thread:
            self._thread.join(timeout)

    @property
    def is_loading(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    @property
    def progress(self) -> float:
        return self.num_splats_loaded / max(1, self._ply.size)

    # -- worker ------------------------------------------------------------

    def _run(self) -> None:
        ply = self._ply
        n = ply.size
        stride = -(-n // self._chunks)
        means, scales, quats, opac, sh = plyio.splat_arrays_from_ply(ply)
        if self._morton:
            # Fast-path rendering wants Morton-local blocks (ops/blocks2.py);
            # reorder host-side before chunking so streamed chunks land in
            # their final positions.
            from ..ops.blocks import morton_order
            order = morton_order(means)
            means, scales, quats, opac, sh = (
                means[order], scales[order], quats[order], opac[order],
                sh[order])
        for c in range(self._chunks):
            if self._cancel:
                return
            lo = c * stride
            hi = min(n, lo + stride)
            if lo >= hi:
                break
            cov6 = build_covariance(scales[lo:hi], quats[lo:hi])
            now = np.float32(self._time_fn())
            with self.write_lock:
                cl = self.cloud
                self.cloud = SplatCloud(
                    means=_write_chunk(cl.means,
                                       jnp.asarray(means[lo:hi]), lo),
                    cov3d=_write_chunk(cl.cov3d, jnp.asarray(cov6), lo),
                    opacity=_write_chunk(cl.opacity,
                                         jnp.asarray(opac[lo:hi]), lo),
                    sh=_write_chunk(cl.sh, jnp.asarray(sh[lo:hi]), lo),
                    upload_time=_write_chunk(
                        cl.upload_time,
                        jnp.full((hi - lo,), now, jnp.float32), lo),
                    num_splats=n,
                )
            with self._lock:
                self.num_splats_loaded += hi - lo
        if self._cancel:
            return
        if self._on_loaded:
            self._on_loaded()
