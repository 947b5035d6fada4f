"""Per-pass timing: the ``gpu::Queries`` analog.

Reference: GPU timestamp queries bracket every pass and the whole frame,
resolved per frame and surfaced in the GUI performance window
(`crates/lib/src/renderer.rs:444-448,548`, `albedo_backend::gpu::Queries`
surface, `gui/windows/performance_info.rs:23-47`). Labels observed there:
"ray generation", "primary intersection", "shading 0", "asvgf".

On TPU, fine-grained in-graph timestamps don't exist; we time at dispatch
granularity with ``block_until_ready`` fences when ``sync=True`` (exact,
perturbs pipelining) or wall-clock samples otherwise. ``jax.profiler`` trace
capture is exposed for real kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import List, Optional


class Queries:
    """Frame-scoped labeled timers (Queries::start/end/resolve analog)."""

    def __init__(self, max_queries: int = 16, sync: bool = False):
        self.max_queries = max_queries
        self.sync = sync
        self._current: "OrderedDict[str, float]" = OrderedDict()
        self._resolved: "OrderedDict[str, float]" = OrderedDict()
        self._open: Optional[tuple] = None
        self._frame_start = 0.0
        self._frame_ms = 0.0

    # -- frame brackets (start_frame/end_frame analog) ----------------------
    def start_frame(self) -> None:
        self._current = OrderedDict()
        self._frame_start = time.perf_counter()

    def end_frame(self) -> None:
        self._frame_ms = (time.perf_counter() - self._frame_start) * 1e3

    # -- pass brackets -------------------------------------------------------
    def start(self, label: str) -> None:
        self._open = (label, time.perf_counter())

    def end(self, result=None) -> None:
        if self._open is None:
            return
        label, t0 = self._open
        if self.sync and result is not None:
            import jax

            jax.block_until_ready(result)
        if len(self._current) < self.max_queries:
            self._current[label] = (time.perf_counter() - t0) * 1e3
        self._open = None

    @contextlib.contextmanager
    def scope(self, label: str):
        self.start(label)
        try:
            yield
        finally:
            self.end()

    def record(self, label: str, ms: float) -> None:
        """Record an externally measured duration under ``label`` (used by
        Renderer.measure_passes to surface per-pass kernel timings)."""
        if len(self._current) < self.max_queries:
            self._current[label] = ms

    def resolve(self) -> None:
        """Latch this frame's timings (Queries::resolve analog)."""
        self._resolved = self._current

    # -- GUI surface (performance_info.rs:23-47) ----------------------------
    def values(self) -> List[float]:
        return list(self._resolved.values())

    def labels(self) -> List[str]:
        return list(self._resolved.keys())

    @property
    def frame_ms(self) -> float:
        return self._frame_ms


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Capture a jax.profiler trace (WGPU_TRACE env analog,
    standalone/lib.rs:199)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
