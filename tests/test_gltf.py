"""glTF loader tests against the in-mount cornell-box.glb.

Expected structure confirmed by parsing the GLB container directly:
5 meshes / 3 materials / 5 nodes, each node instancing one primitive
(SURVEY.md §4; reference loader semantics at gltf.rs:46-156).
"""

import numpy as np

from loupiote_tpu.scene import INVALID_INDEX, Scene, load_gltf, load_gltf_path


def test_cornell_structure(cornell_scene):
    s = cornell_scene
    # Default scene contributes 1 material + 1 light (scene.rs:37-53).
    assert len(s.meshes) == 5
    assert len(s.instances) == 5
    assert len(s.materials) == 1 + 3
    assert len(s.lights) == 1
    assert len(s.images) == 0

    stats = s.stats()
    assert stats["triangles"] > 0
    assert stats["vertices"] > 0


def test_cornell_materials(cornell_scene):
    mats = cornell_scene.materials[1:]
    # Base (white 0.4 rough), GreenWall, RedWall.
    np.testing.assert_allclose(mats[0].color, [1, 1, 1, 1])
    assert abs(mats[0].roughness - 0.4) < 1e-5
    assert mats[0].reflectivity == 0.0
    np.testing.assert_allclose(mats[1].color, [0, 1, 0, 1])
    np.testing.assert_allclose(mats[2].color, [1, 0, 0, 1])
    for m in mats:
        assert m.albedo_texture == int(INVALID_INDEX)
        assert m.mra_texture == int(INVALID_INDEX)


def test_cornell_geometry_bounds(cornell_scene):
    allpos = np.concatenate([m.positions for m in cornell_scene.meshes])
    # Cornell box fits in a small box around the origin.
    assert np.isfinite(allpos).all()
    assert (np.abs(allpos) < 100).all()


def test_instances_reference_valid_meshes(cornell_scene):
    for inst in cornell_scene.instances:
        assert 0 <= inst.mesh_index < len(cornell_scene.meshes)
        assert inst.material_index < len(cornell_scene.materials)
        assert inst.model_to_world.shape == (4, 4)


def test_gltf_json_with_data_uri():
    import base64
    import json

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    raw = pos.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": "data:application/octet-stream;base64," + base64.b64encode(raw).decode(), "byteLength": len(raw)}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0, "byteLength": len(raw)}],
        "accessors": [{"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
    }
    scene = Scene.default()
    load_gltf(json.dumps(doc).encode(), scene)
    assert len(scene.meshes) == 1
    assert len(scene.instances) == 1
    # Non-indexed primitive gets identity indices (gltf.rs:103-105).
    np.testing.assert_array_equal(scene.meshes[0].indices, [0, 1, 2])


def test_node_trs_matrix():
    from loupiote_tpu.scene.gltf import _node_local_matrix

    m = _node_local_matrix({
        "translation": [1, 2, 3],
        "rotation": [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)],  # 90 deg about Z
        "scale": [2, 2, 2],
    })
    v = m @ np.array([1, 0, 0, 1], np.float32)
    np.testing.assert_allclose(v[:3], [1, 4, 3], atol=1e-5)
