"""Fuzz: random scenes x random camera poses, wide kernel vs SIMT oracle
(ROADMAP verification item). Catches layout/collapse bugs that a single
fixture scene can miss."""

import jax.numpy as jnp
import numpy as np
import pytest

from loupiote_tpu.ops.intersect import intersect_rays
from loupiote_tpu.ops.pallas_wide import TILE, intersect_wide, occluded_wide
from loupiote_tpu.scene import Scene, build_scene_buffers
from loupiote_tpu.scene.types import Instance, Mesh


pytestmark = pytest.mark.slow

def _scene(rng, n, spread, size):
    v0 = ((rng.random((n, 3)) - 0.5) * spread).astype(np.float32)
    v1 = v0 + ((rng.random((n, 3)) - 0.5) * size).astype(np.float32)
    v2 = v0 + ((rng.random((n, 3)) - 0.5) * size).astype(np.float32)
    s = Scene.default()
    pos = np.empty((n * 3, 3), np.float32)
    pos[0::3], pos[1::3], pos[2::3] = v0, v1, v2
    s.meshes.append(Mesh(pos, None, None, np.arange(n * 3, dtype=np.uint32)))
    s.instances.append(Instance(0, np.eye(4, dtype=np.float32), 0))
    return build_scene_buffers(s)


@pytest.mark.parametrize("seed,n,spread,size", [
    (1, 37, 4.0, 2.0),      # few big overlapping triangles
    (2, 900, 15.0, 0.2),    # sparse cloud of small triangles
    (3, 5000, 8.0, 0.8),    # dense cluster (deep tree)
    (4, 260, 30.0, 8.0),    # long skinny boxes, huge overlap
])
def test_wide_matches_simt_fuzz(seed, n, spread, size):
    rng = np.random.default_rng(seed)
    bufs = _scene(rng, n, spread, size)
    R = TILE
    ro = ((rng.random((R, 3)) - 0.5) * spread * 2.5).astype(np.float32)
    rd = (rng.random((R, 3)) - 0.5).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    ref = intersect_rays(bufs, jnp.asarray(ro), jnp.asarray(rd))
    out = intersect_wide(bufs, jnp.asarray(ro), jnp.asarray(rd),
                         interpret=True)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                               rtol=1e-4)
    mismatch = (np.asarray(ref.tri) != np.asarray(out.tri)).mean()
    assert mismatch < 0.01  # t-ties may pick either triangle

    dist = jnp.full(R, float(spread))
    refb = intersect_rays(bufs, jnp.asarray(ro), jnp.asarray(rd),
                          tmax=dist, any_hit=True)
    outb = occluded_wide(bufs, jnp.asarray(ro), jnp.asarray(rd), dist,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(outb),
                                  np.asarray(refb.tri) >= 0)
