"""Texture pipeline tests: atlas sampling + textured PBR render
(the Damaged-Helmet config analog; asset not mounted, so procedural)."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from loupiote_tpu.ops.texture import sample_atlas, srgb_to_linear
from loupiote_tpu.render.integrator import trace_paths
from loupiote_tpu.scene import (ImageData, Scene, build_scene_buffers)
from loupiote_tpu.scene.types import Instance, Material, Mesh

from test_render import look_at_matrix


def checkerboard(n=32, c0=(255, 0, 0, 255), c1=(0, 0, 255, 255)):
    img = np.zeros((n, n, 4), np.uint8)
    yy, xx = np.mgrid[0:n, 0:n]
    mask = ((xx // 4) + (yy // 4)) % 2 == 0
    img[mask] = c0
    img[~mask] = c1
    return img


def textured_quad_scene():
    scene = Scene.default()
    scene.images.append(ImageData.from_array(checkerboard()))
    # metallic-roughness map: G=rough B=metal, constant.
    mra = np.zeros((8, 8, 4), np.uint8)
    mra[..., 1] = 255  # fully rough
    mra[..., 2] = 0  # non-metallic
    scene.images.append(ImageData.from_array(mra))
    scene.materials.append(Material(
        color=np.ones(4, np.float32), roughness=1.0, reflectivity=1.0,
        albedo_texture=0, mra_texture=1))
    q = 2.0
    pos = np.array([[-q, -q, 0], [q, -q, 0], [q, q, 0], [-q, q, 0]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    nrm = np.tile([[0, 0, 1]], (4, 1)).astype(np.float32)
    scene.meshes.append(Mesh(pos, nrm, uv, np.array([0, 1, 2, 0, 2, 3], np.uint32)))
    scene.instances.append(Instance(0, np.eye(4, dtype=np.float32), 1))
    return scene


def test_sample_atlas_exact(rng):
    scene = textured_quad_scene()
    bufs = build_scene_buffers(scene)
    # Sample texel centers of texture 0 (32x32 checkerboard).
    n = 32
    uv = jnp.asarray([[ (4 + 0.5) / n, (0 + 0.5) / n],   # block (1,0): odd parity -> c1
                      [ (0 + 0.5) / n, (0 + 0.5) / n]])  # block (0,0): even parity -> c0
    tex_id = jnp.zeros(2, jnp.int32)
    rgba = np.asarray(sample_atlas(bufs, tex_id, uv, srgb=False))
    np.testing.assert_allclose(rgba[0], [0, 0, 1, 1], atol=1e-3)
    np.testing.assert_allclose(rgba[1], [1, 0, 0, 1], atol=1e-3)
    # tex_id < 0 -> white.
    white = np.asarray(sample_atlas(bufs, jnp.asarray([-1]), uv[:1]))
    np.testing.assert_allclose(white, 1.0)


def test_srgb_decode_monotonic():
    x = jnp.linspace(0, 1, 64)
    y = np.asarray(srgb_to_linear(x))
    assert (np.diff(y) > 0).all()
    assert abs(y[-1] - 1.0) < 1e-6


def test_textured_render_shows_checkerboard(rng):
    scene = textured_quad_scene()
    from loupiote_tpu.scene.hdr import build_probe

    probe = build_probe(np.ones((8, 16, 3), np.float32))
    scene.lights = []
    bufs = build_scene_buffers(scene, probe=probe)
    assert bufs.has_textures

    cam = look_at_matrix([0, 0, 5], [0, 0, -1])
    w = h = 32
    _, gb = trace_paths(bufs, jnp.asarray(cam), w, h, jr.PRNGKey(0), bounces=1)
    albedo = np.asarray(gb.albedo).reshape(h, w, 3)
    mesh = np.asarray(gb.mesh_id).reshape(h, w)
    hitm = mesh >= 0
    assert hitm.mean() > 0.3
    # Hit pixels are either red-ish or blue-ish (sRGB-decoded checker).
    reds = albedo[hitm][:, 0] > albedo[hitm][:, 2]
    assert 0.2 < reds.mean() < 0.8  # both colors present
    # Pure colors: green channel stays near zero on hits.
    assert albedo[hitm][:, 1].max() < 0.1
