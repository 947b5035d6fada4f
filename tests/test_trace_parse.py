"""Per-pass device-trace attribution (app/trace_parse.py): the measured
analog of the reference's GPU timestamp queries
(`crates/lib/src/renderer.rs:444-448`, `performance_info.rs:23-47`)."""

from collections import OrderedDict

import pytest

pb2 = pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")

from loupiote_tpu.app.trace_parse import (attribute_passes,  # noqa: E402
                                          device_op_events,
                                          frame_scope_labels)


def _synthetic_xspace():
    """Build an XSpace like a TPU device trace: one /device:TPU:0 plane,
    an 'XLA Ops' line whose events carry jax name-stacks in a tf_op stat."""
    xs = pb2.XSpace()
    plane = xs.planes.add()
    plane.name = "/device:TPU:0"
    plane.stat_metadata[1].id = 1
    plane.stat_metadata[1].name = "tf_op"
    events = [
        ("custom-call.1", "jit(render_frame)/raygen/threefry2x32", 2.0),
        ("custom-call.2", "jit(render_frame)/intersect0/wide_trace", 100.0),
        ("fusion.3", "jit(render_frame)/shade0/mul", 30.0),
        ("sort.4", "jit(render_frame)/sortb1/sort_key", 10.0),
        ("custom-call.5", "jit(render_frame)/intersect1/wide_trace", 140.0),
        ("fusion.6", "jit(render_frame)/shade1/ggx", 31.0),
        ("fusion.7", "jit(render_frame)/asvgf/atrous", 8.0),
        ("copy.8", "", 5.0),  # unmatched -> other
    ]
    for i, (hlo, stack, ms) in enumerate(events, start=1):
        em = plane.event_metadata[i]
        em.id = i
        em.name = hlo
        line = plane.lines.add() if i == 1 else plane.lines[0]
    line = plane.lines[0]
    line.name = "XLA Ops"
    for i, (hlo, stack, ms) in enumerate(events, start=1):
        ev = line.events.add()
        ev.metadata_id = i
        ev.duration_ps = int(ms * 1e9)
        if stack:
            st = ev.stats.add()
            st.metadata_id = 1
            st.str_value = stack
    return xs


def test_attribution_from_synthetic_trace():
    xs = _synthetic_xspace()
    evs = device_op_events(xs)
    assert len(evs) == 8
    labels = frame_scope_labels(bounces=2, denoised=True)
    sums = attribute_passes(evs, labels)
    assert sums["ray generation"] == pytest.approx(2.0)
    assert sums["primary intersection"] == pytest.approx(100.0)
    assert sums["shading 0"] == pytest.approx(30.0)
    assert sums["sort 1"] == pytest.approx(10.0)
    assert sums["intersection 1"] == pytest.approx(140.0)
    assert sums["shading 1"] == pytest.approx(31.0)
    assert sums["asvgf"] == pytest.approx(8.0)
    assert sums["other"] == pytest.approx(5.0)


def test_no_token_collision():
    """'intersect1' must not swallow 'intersect10' and vice versa."""
    labels = OrderedDict([("intersect1", "intersection 1"),
                          ("intersect10", "intersection 10")])
    evs = [("f", "jit(f)/intersect10/x", 7.0),
           ("g", "jit(f)/intersect1/x", 3.0)]
    sums = attribute_passes(evs, labels)
    assert sums["intersection 10"] == pytest.approx(7.0)
    assert sums["intersection 1"] == pytest.approx(3.0)


def test_cpu_trace_fallback_is_graceful():
    """On the CPU test backend measure_fused_passes either returns sensible
    sums or None (then measure_passes falls back to the replay estimate) —
    it must not raise."""
    import jax
    import jax.numpy as jnp

    from loupiote_tpu.app.trace_parse import measure_fused_passes

    @jax.jit
    def f():
        with jax.named_scope("raygen"):
            x = jnp.arange(512.0)
        with jax.named_scope("shade0"):
            return jnp.sin(x).sum()

    labels = frame_scope_labels(bounces=1)
    out = measure_fused_passes(lambda: f(), labels)
    assert out is None or all(v >= 0 for v in out.values())
