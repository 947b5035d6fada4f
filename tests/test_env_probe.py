"""Environment-probe integration: a synthetic sun must cast directional
shadows via env importance sampling (NEE) and env evaluation."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np

from loupiote_tpu.ops.env import dir_to_equirect, equirect_to_dir, eval_env, sample_env
from loupiote_tpu.render.integrator import trace_paths
from loupiote_tpu.scene import Scene, build_probe, build_scene_buffers
from loupiote_tpu.scene.types import Instance, Mesh

from test_render import look_at_matrix


def sun_probe(h=32, w=64, sun_uv=(0.25, 0.3), power=200.0):
    rad = np.full((h, w, 3), 0.05, np.float32)
    su, sv = int(sun_uv[0] * w), int(sun_uv[1] * h)
    rad[sv - 1: sv + 2, su - 1: su + 2] = power
    return build_probe(rad)


def test_equirect_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    u, v = dir_to_equirect(jnp.asarray(d))
    d2 = np.asarray(equirect_to_dir(u, v))
    np.testing.assert_allclose(d2, d, atol=1e-5)


def test_sample_env_prefers_sun():
    probe = sun_probe()
    scene = Scene.default()
    scene.lights = []
    bufs = build_scene_buffers(scene, probe=probe)
    rng = np.random.default_rng(1)
    u1 = jnp.asarray(rng.random(4096))
    u2 = jnp.asarray(rng.random(4096))
    d, pdf = sample_env(bufs, u1, u2)
    # Most samples land near the sun direction.
    sun_dir = np.asarray(equirect_to_dir(jnp.asarray([0.25]), jnp.asarray([0.3])))[0]
    cos = np.asarray(d) @ sun_dir
    assert (cos > 0.95).mean() > 0.5
    assert np.asarray(pdf).min() > 0
    # eval_env at the sun is bright.
    assert float(eval_env(bufs, jnp.asarray(sun_dir[None]))[0, 0]) > 10.0


def test_sun_shadow_direction():
    """A box on a ground plane under a sun probe casts a shadow on the
    opposite side of the sun."""
    probe = sun_probe(sun_uv=(0.25, 0.25))  # sun high, +x-ish direction
    scene = Scene.default()
    scene.lights = []
    g = 20.0
    gp = np.array([[-g, 0, -g], [g, 0, -g], [g, 0, g], [-g, 0, g]], np.float32)
    scene.meshes.append(Mesh(gp, np.tile([[0, 1, 0]], (4, 1)).astype(np.float32),
                             None, np.array([0, 1, 2, 0, 2, 3], np.uint32)))
    scene.instances.append(Instance(0, np.eye(4, dtype=np.float32), 0))
    # Unit cube sitting on the plane at origin.
    c = 0.8
    v = np.array([[x, y, z] for x in (-c, c) for y in (0, 2 * c)
                  for z in (-c, c)], np.float32)
    faces = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    idx = []
    for a, b, cc, d in faces:
        idx += [a, b, cc, a, cc, d]
    scene.meshes.append(Mesh(v, None, None, np.asarray(idx, np.uint32)))
    scene.instances.append(Instance(1, np.eye(4, dtype=np.float32), 0))
    bufs = build_scene_buffers(scene, probe=probe)

    # Near-top-down (exactly [0,-1,0] gimbal-locks the look-at helper).
    cam = look_at_matrix([0, 8, 1.5], [0.0, -1.0, -0.18])
    w = h = 32
    acc = 0.0
    for i in range(6):
        rad, _ = trace_paths(bufs, jnp.asarray(cam), w, h, jr.PRNGKey(i),
                             bounces=2)
        acc = acc + np.asarray(rad).reshape(h, w, 3)
    acc /= 6
    lum = acc.mean(-1)
    sun_dir = np.asarray(equirect_to_dir(jnp.asarray([0.25]),
                                         jnp.asarray([0.25])))[0]
    # Shadow falls opposite the sun's horizontal direction. Camera: top-down
    # with forward -y; image +x = world -x(ish), +y(rows) = world +z? Use
    # energy asymmetry: the half-plane away from the sun is darker.
    xs = np.linspace(-1, 1, w)[None, :].repeat(h, 0)
    zs = np.linspace(-1, 1, h)[:, None].repeat(w, 1)
    # Map pixels to world via the known look_at basis.
    right = np.cross([0, -1, 0], [0, 1, 0])  # degenerate guard unused
    # Simply compare the two image halves along the axis of the sun's
    # strongest horizontal component, excluding the cube region.
    cube = (np.abs(xs) < 0.35) & (np.abs(zs) < 0.35)
    horiz = np.array([sun_dir[0], sun_dir[2]])
    ax = int(np.argmax(np.abs(horiz)))
    coord = xs if ax == 0 else zs
    near_sun = (coord * np.sign(horiz[ax]) > 0.3) & ~cube
    far_sun = (coord * np.sign(horiz[ax]) < -0.3) & ~cube
    sides = sorted([lum[near_sun].mean(), lum[far_sun].mean()])
    # One side carries the shadow: meaningfully darker.
    assert sides[0] < 0.9 * sides[1], sides
