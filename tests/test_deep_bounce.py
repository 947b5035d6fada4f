"""Deep-bounce config (BASELINE configs[3]: 8-bounce progressive + NEE).

Exercises the static bounce loop at depth 8 with inter-bounce sorting:
energy must grow monotonically with depth (more light paths) and stay
bounded (no pdf blowups / NaN at deep chains)."""

import pytest

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from loupiote_tpu.render.integrator import trace_paths
from loupiote_tpu.scene import build_scene_buffers

from test_render import CORNELL_CAM, cornell_with_light


pytestmark = pytest.mark.slow

def test_eight_bounce_energy(cornell_scene):
    bufs = build_scene_buffers(cornell_with_light(cornell_scene))
    w = h = 24
    means = {}
    for bounces in (1, 3, 8):
        f = jax.jit(lambda k, b=bounces: trace_paths(
            bufs, jnp.asarray(CORNELL_CAM), w, h, k, bounces=b)[0])
        acc = 0.0
        for i in range(4):
            r = np.asarray(f(jr.PRNGKey(100 + i)))
            assert np.isfinite(r).all(), f"non-finite at {bounces} bounces"
            acc = acc + r
        means[bounces] = (acc / 4).mean()
    # More bounces -> strictly more transported energy, with diminishing
    # returns (Cornell albedo < 1 so the series converges).
    assert means[1] < means[3] < means[8]
    assert means[8] - means[3] < means[3] - means[1]
    assert means[8] < 4.0 * means[1]  # bounded
