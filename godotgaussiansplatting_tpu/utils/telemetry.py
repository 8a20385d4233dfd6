"""Per-stage timing + memory telemetry.

The reference instruments every stage with GPU timestamps
(gaussian_splatting_rasterizer.gd:135-160: Start/Projection/Sort/Boundaries/
Render) and renders them in ImGui (main.gd:106-119). Same five stage names
here; timings come from timed jit executions of each stage (with forced host
sync), plus jax device memory stats standing in for VRAM (main.gd:102-104).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np

# Stage names per pipeline (the reference's set is the exact-mode one,
# gaussian_splatting_rasterizer.gd:135-160).
STAGE_NAMES = ("Projection", "Sort", "Boundaries", "Render")
STAGE_NAMES_FAST = ("Projection", "Blocks", "Binning", "Render")

_dispatch_overhead_ms: Optional[float] = None


def dispatch_overhead_ms() -> float:
    """Calibrated fixed cost of one dispatch + 1-element readback.

    On the tunneled TPU in this environment that is ~25 ms — far larger than
    most stages — so per-stage wall times subtract it (clamped at 0). On a
    local chip it is ~0.1 ms and the correction is negligible."""
    global _dispatch_overhead_ms
    if _dispatch_overhead_ms is None:
        import jax
        import jax.numpy as jnp
        f = jax.jit(lambda x: x * 2.0)
        x = jnp.ones((8, 128), jnp.float32)
        np.asarray(f(x))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(x)).ravel()[:1]
            ts.append(time.perf_counter() - t0)
        _dispatch_overhead_ms = min(ts) * 1e3
    return _dispatch_overhead_ms


def make_stage_timer(timings: "StageTimings", subtract_overhead: bool = True):
    """Returns a `timer(name, probe)` context-manager factory for staged
    pipelines (the analogue of capture_timestamp around each dispatch,
    gaussian_splatting_rasterizer.gd:135-160). `probe()` is evaluated at
    scope exit and one element of its result is read back to host, forcing
    the stage to complete; the calibrated dispatch overhead is subtracted."""
    oh = dispatch_overhead_ms() if subtract_overhead else 0.0

    @contextlib.contextmanager
    def timer(name: str, probe):
        t0 = time.perf_counter()
        yield   # on exception: skip the probe (it reads the stage's output)
        force_readback(probe())
        ms = (time.perf_counter() - t0) * 1e3
        timings.record(name, max(ms - oh, 0.0))

    return timer


class StageTimings:
    """Rolling per-stage wall/device times, formatted like the ImGui panel."""

    def __init__(self):
        self._ms: Dict[str, float] = {}
        self._order: List[str] = []

    def record(self, name: str, ms: float) -> None:
        if name not in self._ms:
            self._order.append(name)
        self._ms[name] = ms

    @property
    def total_ms(self) -> float:
        return sum(self._ms.values())

    def lines(self) -> List[str]:
        """'Projection:      0.42ms ( 5.31%)' rows + total, mirroring
        main.gd:110-119."""
        total = self.total_ms or 1.0
        rows = [
            f"{name + ':':<16} {self._ms[name]:.2f}ms "
            f"({self._ms[name] / total * 1e2:5.2f}%)"
            for name in self._order
        ]
        rows.append(f"{'Total Time:':<16} {self.total_ms:.2f}ms")
        return rows

    def as_dict(self) -> Dict[str, float]:
        return dict(self._ms)


def force_readback(x) -> None:
    """Force execution by pulling one element to host."""
    import jax
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "shape")]
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


def device_memory_stats(device=None) -> Optional[Dict[str, int]]:
    """HBM usage (bytes) — the VRAM line of the debug panel (main.gd:102-104).
    Returns None when the backend doesn't expose memory_stats."""
    import jax
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return {"bytes_in_use": stats.get("bytes_in_use", 0),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            "bytes_limit": stats.get("bytes_limit", 0)}


def format_bytes(n: int) -> str:
    """main.gd:104's MB/GB formatting."""
    return f"{n * 1e-6:.2f}MB" if n < 1e9 else f"{n * 1e-9:.2f}GB"
