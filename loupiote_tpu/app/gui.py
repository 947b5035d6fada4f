"""Status/inspection surface: the egui GUI analog, headless.

The reference GUI (`crates/standalone/src/gui/`) provides: a scene-info
window (adapter, mesh count, BVH nodes), a performance window (frame delta,
FPS, per-pass GPU timings), a modal error window, and a rendering toolbar
(accumulate / blue-noise checkboxes + blit-mode combo). Headless analog:
structured status dicts + a terminal renderer, driven from the same state.
"""

from __future__ import annotations

from typing import Optional

from ..config import BlitMode

BLIT_MODES = list(BlitMode)  # toolbar combo entries (render_settings.rs:6-28)


def scene_info_window(driver) -> dict:
    """gui/windows/scene_info.rs analog."""
    from ..device import Device

    info = {"adapter": Device().adapter_info()}
    info.update(getattr(driver, "stats", {}))
    return info


def performance_window(driver) -> dict:
    """gui/windows/performance_info.rs analog: delta, FPS, per-pass times.

    ``frame_ms``/``fps`` time the PRODUCTION fused frame. ``passes`` come
    from Renderer.measure_passes. method="trace" (TPU) means MEASURED
    per-pass device times parsed from a fused-frame profiler trace — the
    GPU-timestamp analog. method="replay" (off-device fallback) means the
    kernels were re-dispatched one stage at a time and RESCALED to sum to
    the fused frame — the per-pass shares are then estimates, and the flag
    makes that explicit."""
    q = driver.queries
    method = getattr(driver, "last_pass_method", "replay")
    return {
        "frame_ms": q.frame_ms,
        "fps": driver.fps,
        "passes": dict(zip(q.labels(), q.values())),
        "pass_timing_method": method,
        "pass_shares_estimated_from_unfused_replay": method == "replay",
    }


def error_window(error: Optional[Exception]) -> dict:
    """gui/windows/error.rs analog (modal error)."""
    return {"error": None if error is None else f"{type(error).__name__}: {error}"}


def toolbar_state(settings) -> dict:
    """gui/toolbar/render_settings.rs analog."""
    return {
        "accumulate": settings.accumulate,
        "use_blue_noise": settings.use_blue_noise,
        "blit_mode": settings.blit_mode.value,
        "blit_modes": [m.value for m in BLIT_MODES],
    }


def render_status(driver, error: Optional[Exception] = None) -> str:
    """One-call terminal status block (the whole GUI, textually)."""
    perf = performance_window(driver)
    scene = scene_info_window(driver)
    tb = toolbar_state(driver.settings)
    lines = [
        f"loupiote_tpu  |  {perf['fps']:.1f} fps  {perf['frame_ms']:.1f} ms",
        f"mode={tb['blit_mode']} accumulate={tb['accumulate']} "
        f"blue_noise={tb['use_blue_noise']}",
        "passes: " + "  ".join(f"{k}={v:.1f}ms" for k, v in perf["passes"].items()),
        f"scene: {scene.get('meshes', 0)} meshes, "
        f"{scene.get('triangles', 0)} tris, "
        f"{scene.get('bvh_nodes', 0)} BVH nodes, "
        f"{scene.get('instances', 0)} instances",
    ]
    err = error_window(error)["error"]
    if err:
        lines.append(f"ERROR: {err}")
    return "\n".join(lines)
