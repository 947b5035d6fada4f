"""Multi-device tile/spp sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from loupiote_tpu.parallel import make_mesh, replicate_scene, trace_paths_sharded
from loupiote_tpu.render.integrator import trace_paths

from test_render import CORNELL_CAM, cornell_with_light


@pytest.fixture(scope="module")
def cornell_bufs(cornell_scene):
    from loupiote_tpu.scene import build_scene_buffers

    return build_scene_buffers(cornell_with_light(cornell_scene))


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    m = make_mesh()
    assert m.shape == {"tiles": 8, "spp": 1}
    m2 = make_mesh(n_tiles=4, n_spp=2)
    assert m2.shape == {"tiles": 4, "spp": 2}


def test_sharded_trace_matches_single(cornell_bufs):
    """Tile-sharded tracing reproduces single-device results exactly for
    deterministic outputs (G-buffer geometry) and statistically for
    radiance."""
    w = h = 32
    mesh = make_mesh(n_tiles=4, n_spp=1)
    scene = replicate_scene(cornell_bufs, mesh)
    key = jr.PRNGKey(3)
    img, gbuf = trace_paths_sharded(scene, jnp.asarray(CORNELL_CAM), key,
                                    mesh=mesh, width=w, height=h, bounces=2)
    assert img.shape == (h, w, 3)
    assert np.isfinite(np.asarray(img)).all()

    # The G-buffer depends only on geometry + per-tile jitter; compare the
    # hit mask against an unsharded render.
    _, gb_ref = trace_paths(cornell_bufs, jnp.asarray(CORNELL_CAM), w, h,
                            jr.PRNGKey(9), bounces=1)
    mesh_ref = np.asarray(gb_ref.mesh_id).reshape(h, w)
    mesh_sh = np.asarray(gbuf["mesh_id"])
    assert (mesh_sh >= 0).mean() > 0.7  # most pixels hit the (open) box
    assert ((mesh_ref >= 0) == (mesh_sh >= 0)).mean() > 0.9

    # Radiance statistics agree with the unsharded tracer.
    accs = []
    for k in range(3):
        r, _ = trace_paths(cornell_bufs, jnp.asarray(CORNELL_CAM), w, h,
                           jr.PRNGKey(100 + k), bounces=2)
        accs.append(np.asarray(r).mean())
    assert abs(np.asarray(img).mean() - np.mean(accs)) < 0.25 * np.mean(accs) + 0.05


def test_spp_axis_reduces_variance(cornell_bufs):
    w = h = 32
    mesh1 = make_mesh(n_tiles=1, n_spp=1, devices=jax.devices()[:1])
    mesh8 = make_mesh(n_tiles=1, n_spp=8)
    scene1 = replicate_scene(cornell_bufs, mesh1)
    scene8 = replicate_scene(cornell_bufs, mesh8)

    def run(mesh, scene, key):
        img, _ = trace_paths_sharded(scene, jnp.asarray(CORNELL_CAM),
                                     jr.PRNGKey(key), mesh=mesh,
                                     width=w, height=h, bounces=2)
        return np.asarray(img)

    # Variance across repeated frames should shrink with 8-way spp.
    f1 = np.stack([run(mesh1, scene1, k) for k in range(8)])
    f8 = np.stack([run(mesh8, scene8, k) for k in range(8)])
    v1 = f1.std(axis=0).mean()
    v8 = f8.std(axis=0).mean()
    assert v8 < 0.7 * v1, (v1, v8)
    # Means agree.
    assert abs(f1.mean() - f8.mean()) < 0.2 * f1.mean() + 0.05
