"""Raw binary mesh loader tests (reference: loaders/binary.rs format)."""

import struct

import numpy as np

from loupiote_tpu.scene import Scene, load_binary


def test_binary_roundtrip():
    # Two triangles, vec4 positions (w ignored), LE.
    tris = np.array([
        [[0, 0, 0, 0], [1, 0, 0, 0], [0, 1, 0, 0]],
        [[2, 0, 0, 0], [3, 0, 0, 0], [2, 1, 0, 0]],
    ], np.float32)
    blob = struct.pack("<I", 2) + tris.tobytes()

    scene = Scene.default()
    load_binary(blob, scene)
    assert len(scene.meshes) == 1
    mesh = scene.meshes[-1]
    assert mesh.positions.shape == (6, 3)
    np.testing.assert_allclose(mesh.positions[1], [1, 0, 0])
    # Facet normals: flat per-triangle, unit length up to the reference's
    # non-renormalized cross of normalized edges (binary.rs:31-47).
    n = mesh.normals
    assert n.shape == (6, 3)
    np.testing.assert_allclose(n[0], n[1])
    np.testing.assert_allclose(n[0], n[2])
    # Triangle in the XY plane -> normal along +-z.
    assert abs(abs(n[0][2]) - np.linalg.norm(n[0])) < 1e-6
    # One identity instance + one default white material appended.
    assert len(scene.instances) == 1
    assert np.allclose(scene.instances[-1].model_to_world, np.eye(4))
    mat = scene.materials[-1]
    np.testing.assert_allclose(mat.color, [1, 1, 1, 1])
    assert mat.roughness == 1.0 and mat.reflectivity == 0.0
