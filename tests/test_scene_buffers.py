"""SceneBuffers flattening + HDR/RGBE + atlas tests."""

import numpy as np

from loupiote_tpu.scene import (ImageData, Scene, build_probe, build_scene_buffers,
                                pack_atlas, rgbe_to_float)
from loupiote_tpu.scene.hdr import float_to_rgbe


def test_cornell_buffers(cornell_scene):
    bufs = build_scene_buffers(cornell_scene)
    assert bufs.num_tris == cornell_scene.stats()["triangles"]
    assert bufs.tri_p0.shape[0] % 128 == 0
    assert bufs.node_min.shape[0] % 128 == 0
    # Padded tris are degenerate: e1 == e2 == 0.
    t = bufs.num_tris
    assert np.allclose(np.asarray(bufs.tri_e1)[t:], 0)
    # Material ids map into the material table.
    assert int(np.asarray(bufs.tri_mat)[:t].max()) < bufs.mat_color.shape[0]
    assert bufs.num_lights == 1


def test_world_space_flattening():
    scene = Scene.default()
    from loupiote_tpu.scene import Instance, Mesh

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [10, 20, 30]
    scene.meshes.append(Mesh(pos, None, None, np.arange(3, dtype=np.uint32)))
    scene.instances.append(Instance(0, m, 0))
    bufs = build_scene_buffers(scene)
    p0 = np.asarray(bufs.tri_p0)[0]
    assert (np.abs(p0 - np.array([10, 20, 30])) < 2.0).all()


def test_rgbe_roundtrip(rng):
    rgb = (rng.random((16, 16, 3)) * 100).astype(np.float32)
    rec = rgbe_to_float(float_to_rgbe(rgb))
    rel = np.abs(rec - rgb) / np.maximum(rgb.max(axis=-1, keepdims=True), 1e-6)
    assert rel.max() < 0.01  # 8-bit mantissa => <1% relative error


def test_probe_cdf(rng):
    rad = (rng.random((32, 64, 3))).astype(np.float32)
    probe = build_probe(rad)
    assert probe.cdf_marg[-1] == 1.0 or abs(probe.cdf_marg[-1] - 1.0) < 1e-5
    assert (np.diff(probe.cdf_marg) >= 0).all()
    assert (np.diff(probe.cdf_cond, axis=1) >= -1e-7).all()
    # pdf integrates to ~1 over the sphere (sum pdf * dOmega per texel).
    h, w = 32, 64
    theta = (np.arange(h) + 0.5) / h * np.pi
    d_omega = (np.pi / h) * (2 * np.pi / w) * np.sin(theta)[:, None]
    assert abs((probe.pdf * d_omega).sum() - 1.0) < 1e-3


def test_atlas_pack(rng):
    imgs = []
    for k in range(5):
        w, h = int(rng.integers(4, 64)), int(rng.integers(4, 64))
        arr = (rng.random((h, w, 4)) * 255).astype(np.uint8)
        imgs.append(ImageData.from_array(arr))
    atlas = pack_atlas(imgs, size=128)
    assert atlas.blocks.shape == (5, 5)
    for i, img in enumerate(imgs):
        x, y, layer, w, h = atlas.blocks[i]
        assert (w, h) == (img.width, img.height)
        np.testing.assert_array_equal(
            atlas.texture[layer, y:y + h, x:x + w], img.data)


def test_empty_scene_buffers():
    bufs = build_scene_buffers(Scene.default())
    assert bufs.num_tris == 1  # degenerate placeholder triangle
