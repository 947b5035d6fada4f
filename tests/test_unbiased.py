"""Estimator consistency tests: NEE+MIS and BSDF-only sampling must
converge to the same image mean (MIS unbiasedness), and the lightmap baker
must agree with the analytic furnace result."""

import pytest

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from loupiote_tpu.ops.lightmap import bake_vertex_irradiance
from loupiote_tpu.render.integrator import trace_paths
from loupiote_tpu.scene import Light, Scene, build_probe, build_scene_buffers
from loupiote_tpu.scene.types import Instance, Mesh

from test_render import look_at_matrix


pytestmark = pytest.mark.slow

def closed_box_scene(emit=8.0):
    """A closed white box with a quad light inside: low-variance interior."""
    scene = Scene.default()
    q = 2.0
    # Inward-facing cube (12 tris).
    v = np.array([[x, y, z] for x in (-q, q) for y in (-q, q) for z in (-q, q)],
                 np.float32)
    faces = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    idx = []
    for a, b, c, d in faces:
        idx += [a, b, c, a, c, d]
    scene.meshes.append(Mesh(v, None, None, np.asarray(idx, np.uint32)))
    scene.instances.append(Instance(0, np.eye(4, dtype=np.float32), 0))
    scene.materials[0].roughness = 0.8
    scene.lights = [Light(
        origin=np.array([-0.5, q - 0.05, -0.5], np.float32),
        edge_u=np.array([1.0, 0, 0], np.float32),
        edge_v=np.array([0, 0, 1.0], np.float32),
        emission=np.array([1.0, 1.0, 1.0], np.float32), intensity=emit)]
    return scene


def test_nee_matches_bsdf_sampling():
    bufs = build_scene_buffers(closed_box_scene())
    cam = look_at_matrix([0, 0, 1.5], [0, 0, -1])
    w = h = 16

    def render(nee, frames, seed0):
        f = jax.jit(lambda k: trace_paths(bufs, jnp.asarray(cam), w, h, k,
                                          bounces=3, nee=nee)[0])
        acc = 0.0
        for i in range(frames):
            acc = acc + np.asarray(f(jr.PRNGKey(seed0 + i)))
        return acc / frames

    img_nee = render(True, 12, 0)
    img_pt = render(False, 48, 1000)  # BSDF-only needs more samples
    m_nee, m_pt = img_nee.mean(), img_pt.mean()
    assert m_nee > 0.01
    assert abs(m_nee - m_pt) < 0.15 * max(m_nee, m_pt), (m_nee, m_pt)


def test_lightmap_furnace():
    """Uniform unit env -> baked irradiance at an unoccluded point = pi."""
    probe = build_probe(np.ones((8, 16, 3), np.float32))
    scene = Scene.default()
    scene.lights = []
    bufs = build_scene_buffers(scene, probe=probe)
    pos = jnp.zeros((8, 3))
    nrm = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (8, 1))
    irr = bake_vertex_irradiance(bufs, pos, nrm, jr.PRNGKey(0),
                                 samples=8, bounces=1)
    np.testing.assert_allclose(np.asarray(irr), np.pi, rtol=1e-3)
