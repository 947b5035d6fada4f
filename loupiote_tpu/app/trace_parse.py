"""Per-pass timing from a fused-frame device trace.

The reference surfaces REAL GPU timestamps per pass
(`crates/lib/src/renderer.rs:444-448,457,515`,
`gui/windows/performance_info.rs:23-47`). The TPU analog: capture one
``jax.profiler`` trace of the fused frame, parse the device plane's
"XLA Ops" line, and attribute each op's duration to a pass label via the
``jax.named_scope`` annotations the integrator places around every stage
(raygen / intersectN / shadeN / sortN / asvgf / ...). Fusions that merge
ops from two stages are attributed to the first scope found in their
name stack — the Pallas traversal kernels and the sort dispatchers are
custom calls that never fuse across stages, so the big numbers are exact.

The trace is a TensorBoard XSpace protobuf
(``plugins/profile/<run>/<host>.xplane.pb``), parsed with the
``xplane_pb2`` bindings shipped inside the baked-in tensorflow wheel.
"""

from __future__ import annotations

import glob
import os
import re
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple


def _xplane_pb2():
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
        return xplane_pb2
    except Exception:
        return None


def find_xplane_files(logdir: str) -> List[str]:
    """Newest-run ``*.xplane.pb`` files under a profiler logdir."""
    runs = sorted(glob.glob(os.path.join(logdir, "plugins", "profile", "*")),
                  key=os.path.getmtime)
    if not runs:
        return []
    return sorted(glob.glob(os.path.join(runs[-1], "*.xplane.pb")))


def load_xspace(logdir: str):
    """Parse the newest trace run under ``logdir`` into an XSpace proto."""
    pb2 = _xplane_pb2()
    if pb2 is None:
        return None
    files = find_xplane_files(logdir)
    if not files:
        return None
    xs = pb2.XSpace()
    with open(files[0], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


_DEVICE_PLANE = re.compile(r"/device:(TPU|GPU|CPU):\d+$")


def device_op_events(xs, plane_filter: Optional[str] = None
                     ) -> List[Tuple[str, str, float]]:
    """Flatten device-plane op events to (hlo_name, name_stack, dur_ms).

    ``name_stack`` is the framework op path (the jax name-scope stack) when
    the trace carries it (stat names 'tf_op' / 'name'), else ''.
    """
    out: List[Tuple[str, str, float]] = []
    for plane in xs.planes:
        if plane_filter is not None:
            if plane_filter not in plane.name:
                continue
        elif not _DEVICE_PLANE.search(plane.name):
            continue
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        ev_meta = {m.id: m for m in plane.event_metadata.values()}
        # TPU device planes carry several lines over the same wall time
        # (XLA Modules / XLA Ops / Steps / Framework Ops); summing more
        # than one double-counts. Prefer the per-op line exactly.
        lines = [ln for ln in plane.lines if ln.name == "XLA Ops"]
        if not lines:
            lines = [ln for ln in plane.lines
                     if not ln.name or "op" in ln.name.lower()][:1]
        for line in lines:
            for ev in line.events:
                meta = ev_meta.get(ev.metadata_id)
                hlo = meta.name if meta is not None else ""
                stack = ""
                stats = list(ev.stats)
                if meta is not None:
                    stats += list(meta.stats)
                for st in stats:
                    sname = stat_names.get(st.metadata_id, "")
                    if sname in ("tf_op", "name", "hlo_op", "provenance") \
                            and st.str_value:
                        stack = st.str_value
                        break
                out.append((hlo, stack, ev.duration_ps / 1e9))
    return out


def attribute_passes(events: List[Tuple[str, str, float]],
                     scope_labels: "OrderedDict[str, str]"
                     ) -> "OrderedDict[str, float]":
    """Sum event durations per pass label.

    ``scope_labels`` maps a named_scope token (e.g. 'intersect0') to the
    reported label (e.g. 'primary intersection'); tokens are matched as
    whole path components against the event's name stack, falling back to
    a substring test on the HLO name (Mosaic kernels embed the scope in
    the custom-call target when metadata is stripped).
    """
    sums: "OrderedDict[str, float]" = OrderedDict(
        (label, 0.0) for label in scope_labels.values())
    sums["other"] = 0.0
    patterns = [(re.compile(r"(^|[/(])" + re.escape(tok) + r"([/).]|$)"),
                 tok, label) for tok, label in scope_labels.items()]
    for hlo, stack, ms in events:
        hay = stack or hlo
        for pat, tok, label in patterns:
            if pat.search(hay) or (not stack and tok in hlo):
                sums[label] += ms
                break
        else:
            sums["other"] += ms
    return sums


def measure_fused_passes(fn, scope_labels: "OrderedDict[str, str]",
                         logdir: Optional[str] = None
                         ) -> Optional["OrderedDict[str, float]"]:
    """Run ``fn()`` (one warm fused frame) under a profiler trace and return
    measured per-pass device ms, or None when the platform/trace doesn't
    support device op events (the caller falls back to the replay path)."""
    import tempfile

    import jax

    if _xplane_pb2() is None:
        return None
    own = logdir is None
    logdir = logdir or tempfile.mkdtemp(prefix="loupiote_trace_")
    try:
        with jax.profiler.trace(logdir):
            jax.block_until_ready(fn())
        xs = load_xspace(logdir)
        if xs is None:
            return None
        events = device_op_events(xs)
        if not events:
            return None
        return attribute_passes(events, scope_labels)
    except Exception:
        return None
    finally:
        if own:
            import shutil

            shutil.rmtree(logdir, ignore_errors=True)


def frame_scope_labels(bounces: int, denoised: bool = False
                       ) -> "OrderedDict[str, str]":
    """Scope-token -> GUI label map for one frame, using the reference's
    label vocabulary (performance_info.rs:23-47)."""
    m: "OrderedDict[str, str]" = OrderedDict()
    m["raygen"] = "ray generation"
    for b in range(bounces):
        if b > 0:
            m[f"sortb{b}"] = f"sort {b}"
        m[f"intersect{b}"] = ("primary intersection" if b == 0
                              else f"intersection {b}")
        # Compound token FIRST: the shadow wave nests inside the shade
        # scope (ops/shade.py), and attribution takes the first matching
        # pattern — so "shadeB/shadow" must be tested before "shadeB".
        m[f"shade{b}/shadow"] = f"shadow {b}"
        m[f"shade{b}"] = f"shading {b}"
    if denoised:
        m["asvgf"] = "asvgf"
    return m
