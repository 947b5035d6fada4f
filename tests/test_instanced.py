"""Two-level BLAS/TLAS instancing (scene/instanced.py).

Reference capability: BLASArray::{add_bvh,add_instance}
(`/root/reference/crates/lib/src/scene.rs:43-49`): per-mesh BVHs shared by
transformed instances — moving an instance must NOT rebuild any BVH, and
N instances of a mesh must not cost N x BVH memory.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from loupiote_tpu.ops.intersect import intersect_rays  # noqa: E402
from loupiote_tpu.scene import Scene, build_scene_buffers  # noqa: E402
from loupiote_tpu.scene.instanced import (build_instanced_buffers,  # noqa: E402
                                          update_instance)
from loupiote_tpu.scene.types import Instance, Mesh  # noqa: E402


def _mesh(rng, n=400, spread=2.0):
    base = (rng.random((n, 3), dtype=np.float32) - 0.5) * spread
    p1 = base + (rng.random((n, 3), dtype=np.float32) - 0.5) * 0.4
    p2 = base + (rng.random((n, 3), dtype=np.float32) - 0.5) * 0.4
    positions = np.concatenate([base, p1, p2]).astype(np.float32)
    indices = np.arange(3 * n, dtype=np.int32).reshape(3, n).T.reshape(-1)
    return Mesh(positions=positions, normals=None, texcoords=None,
                indices=indices)


def _xlate(x, y, z):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [x, y, z]
    return m


@pytest.fixture(scope="module")
def scenes(rng):
    scene = Scene.default()
    scene.meshes.append(_mesh(rng))
    for k, off in enumerate([(-3, 0, 0), (3, 0, 0), (0, 3, 0), (0, -3, 0)]):
        scene.instances.append(Instance(
            mesh_index=len(scene.meshes) - 1,
            model_to_world=_xlate(*off), material_index=0))
    flat = build_scene_buffers(scene)
    inst = build_instanced_buffers(scene)
    return scene, flat, inst


def _rays(rng, R=512):
    ro = ((rng.random((R, 3)) - 0.5) * 14).astype(np.float32)
    rd = (rng.random((R, 3)) - 0.5).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_instanced_matches_flattened(scenes, rng):
    _, flat, inst = scenes
    ro, rd = _rays(rng)
    want = intersect_rays(flat, ro, rd)
    from loupiote_tpu.ops.intersect import intersect_any

    got = intersect_any(inst, ro, rd)
    wh = np.asarray(want.tri) >= 0
    gh = np.asarray(got.tri) >= 0
    assert (wh == gh).all()
    # t agrees to float tolerance (flatten pre-transforms vertices;
    # instancing transforms rays — not bitwise identical).
    assert np.allclose(np.asarray(got.t)[wh], np.asarray(want.t)[wh],
                       rtol=1e-4, atol=1e-4)
    assert (np.asarray(got.inst)[gh] >= 0).all()


def test_instanced_uv_object_space(rng):
    """Barycentrics must be replayed in OBJECT space (round-3 advisor):
    a unit triangle translated +5x must return the same u/v a ray through
    the untranslated triangle would — not world-coordinate-polluted values."""
    from loupiote_tpu.ops.intersect import intersect_any

    tri = Mesh(positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                                  np.float32),
               normals=np.array([[0, 0, 1]] * 3, np.float32),
               texcoords=np.array([[0, 0], [1, 0], [0, 1]], np.float32),
               indices=np.array([0, 1, 2], np.int32))
    scene = Scene.default()
    scene.meshes.append(tri)
    scene.instances.append(Instance(mesh_index=0,
                                    model_to_world=_xlate(5, 0, 0),
                                    material_index=0))
    inst = build_instanced_buffers(scene)
    # Hit the translated triangle at object-space barycentrics (u, v) =
    # (0.25, 0.25): world point (5.25, 0.25, 0).
    ro = jnp.asarray(np.array([[5.25, 0.25, 3.0]], np.float32))
    rd = jnp.asarray(np.array([[0.0, 0.0, -1.0]], np.float32))
    hit = intersect_any(inst, ro, rd)
    assert int(hit.tri[0]) == 0
    assert np.allclose(float(hit.u[0]), 0.25, atol=1e-4)
    assert np.allclose(float(hit.v[0]), 0.25, atol=1e-4)


def test_instanced_uv_matches_flattened(scenes, rng):
    """u/v of the winning hit agree with the flattened-scene oracle for
    translated instances (same geometric triangle, same winding)."""
    _, flat, inst = scenes
    ro, rd = _rays(rng)
    from loupiote_tpu.ops.intersect import intersect_any

    want = intersect_rays(flat, ro, rd)
    got = intersect_any(inst, ro, rd)
    wh = np.asarray(want.tri) >= 0
    assert np.allclose(np.asarray(got.u)[wh], np.asarray(want.u)[wh],
                       rtol=1e-3, atol=1e-3)
    assert np.allclose(np.asarray(got.v)[wh], np.asarray(want.v)[wh],
                       rtol=1e-3, atol=1e-3)


def test_occluded_matches(scenes, rng):
    _, flat, inst = scenes
    ro, rd = _rays(rng)
    from loupiote_tpu.ops.intersect import occluded

    dist = jnp.full(ro.shape[0], 8.0)
    a = np.asarray(occluded(flat, ro, rd, dist))
    b = np.asarray(occluded(inst, ro, rd, dist))
    # Boundary-epsilon cases may differ by a ulp of t; demand near-total
    # agreement.
    assert (a == b).mean() > 0.995


def test_update_instance_no_rebuild(scenes, rng):
    scene, _, inst = scenes
    ro, rd = _rays(rng)
    from loupiote_tpu.ops.intersect import intersect_any

    before = intersect_any(inst, ro, rd)
    moved = update_instance(inst, 0, _xlate(-3, 0, 50))
    # The BLAS tuple is untouched — same arrays, no rebuild.
    assert moved.blas is inst.blas
    after = intersect_any(moved, ro, rd)
    # Rays that hit instance 0 must change; others are unchanged.
    i0 = np.asarray(before.inst) == 0
    others = ~i0
    assert np.allclose(np.asarray(after.t)[others],
                       np.asarray(before.t)[others], rtol=1e-4, atol=1e-4)
    assert not np.allclose(np.asarray(after.t)[i0],
                           np.asarray(before.t)[i0])


def test_memory_win(scenes):
    import jax

    _, flat, inst = scenes

    def nbytes(bufs):
        return sum(x.nbytes for x in jax.tree.leaves(bufs)
                   if hasattr(x, "nbytes"))

    # 4 instances share one BLAS: traversal+attribute tables must be well
    # under the flattened build's 4x copies.
    assert nbytes(inst) < 0.55 * nbytes(flat)


def test_scan_tlas_200_instances(rng):
    """Hundreds of instances must work and compile in O(unique meshes),
    not O(instances): above TLAS_UNROLL_MAX the TLAS becomes one lax.scan
    per unique mesh with per-instance AABB culls (VERDICT r4 #9; reference
    bar: BLASArray + tinybvh handle arbitrary instance counts,
    scene.rs:43-49)."""
    import time

    import jax

    from loupiote_tpu.ops.intersect import intersect_any, occluded

    rng200 = np.random.default_rng(2026)
    scene = Scene.default()
    for _ in range(2):  # 2 unique meshes
        scene.meshes.append(_mesh(rng200, n=60, spread=1.2))
    for k in range(200):
        off = (rng200.random(3) - 0.5) * 40
        scene.instances.append(Instance(
            mesh_index=k % 2, model_to_world=_xlate(*off),
            material_index=0))
    flat = build_scene_buffers(scene)
    inst = build_instanced_buffers(scene)
    assert inst.inst_aabb_lo.shape == (200, 3)

    ro, rd = _rays(rng200, R=512)
    t0 = time.time()
    got = jax.block_until_ready(intersect_any(inst, ro, rd))
    trace_compile_s = time.time() - t0
    want = intersect_rays(flat, ro, rd)
    wh = np.asarray(want.tri) >= 0
    gh = np.asarray(got.tri) >= 0
    assert (wh == gh).all()
    assert np.allclose(np.asarray(got.t)[wh], np.asarray(want.t)[wh],
                       rtol=1e-4, atol=1e-4)
    # "Compiling in seconds": the scan path must not blow up trace/compile
    # time the way a 200-deep static unroll would (generous CI bound).
    assert trace_compile_s < 120

    dist = jnp.full(ro.shape[0], 6.0)
    a = np.asarray(occluded(flat, ro, rd, dist))
    b = np.asarray(occluded(inst, ro, rd, dist))
    assert (a == b).mean() > 0.995

    # update_instance keeps cull boxes fresh: move instance 7 far away and
    # make sure no ray still reports it.
    moved = update_instance(inst, 7, _xlate(500.0, 0.0, 0.0))
    after = jax.block_until_ready(intersect_any(moved, ro, rd))
    assert not (np.asarray(after.inst) == 7).any()


def test_candidate_tlas_drain(rng, monkeypatch):
    """Force the candidate TLAS's exact drain loop: 20 heavily-overlapping
    instances with C=1 means almost every ray overlaps more boxes than the
    unrolled candidate waves cover, so correctness rests entirely on the
    while_loop drain (closest AND any-hit)."""
    from loupiote_tpu.ops.intersect import intersect_any, occluded

    rngd = np.random.default_rng(7)
    scene = Scene.default()
    scene.meshes.append(_mesh(rngd, n=40, spread=1.5))
    for _ in range(20):  # all near the origin: AABBs overlap heavily
        off = (rngd.random(3) - 0.5) * 2.0
        scene.instances.append(Instance(
            mesh_index=0, model_to_world=_xlate(*off), material_index=0))
    flat = build_scene_buffers(scene)
    inst = build_instanced_buffers(scene)

    ro = ((rngd.random((256, 3)) - 0.5) * 8).astype(np.float32)
    rd = (rngd.random((256, 3)) - 0.5).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    ro, rd = jnp.asarray(ro), jnp.asarray(rd)
    want = intersect_rays(flat, ro, rd)

    monkeypatch.setenv("LOUPIOTE_TLAS_C", "1")
    got = intersect_any(inst, ro, rd)
    wh = np.asarray(want.tri) >= 0
    assert (wh == (np.asarray(got.tri) >= 0)).all()
    assert np.allclose(np.asarray(got.t)[wh], np.asarray(want.t)[wh],
                       rtol=1e-4, atol=1e-4)

    dist = jnp.full(ro.shape[0], 4.0)
    a = np.asarray(occluded(flat, ro, rd, dist))
    b = np.asarray(occluded(inst, ro, rd, dist))
    assert (a == b).all()

    # And cand-vs-scan agreement at a sane C (the two many-instance modes
    # must be interchangeable).
    monkeypatch.setenv("LOUPIOTE_TLAS_C", "12")
    cand = intersect_any(inst, ro, rd)
    monkeypatch.setenv("LOUPIOTE_TLAS", "scan")
    scan = intersect_any(inst, ro, rd)
    # tri may differ where two instances tie at the same t (visit order
    # differs between the modes); hit mask and t must agree.
    sh = np.asarray(scan.tri) >= 0
    assert (sh == (np.asarray(cand.tri) >= 0)).all()
    assert np.allclose(np.asarray(scan.t)[sh], np.asarray(cand.t)[sh],
                       rtol=1e-4, atol=1e-4)


def test_instanced_render_smoke(scenes, rng):
    """Full render through the Renderer with instanced buffers: normals
    rotate per instance and the image statistically matches flattened."""
    from loupiote_tpu.config import BlitMode, RenderConfig
    from loupiote_tpu.render import Renderer
    from loupiote_tpu.scene import Light

    scene, flat, inst = scenes
    light = Light(origin=np.array([-4, 6, -4], np.float32),
                  edge_u=np.array([8, 0, 0], np.float32),
                  edge_v=np.array([0, 0, 8], np.float32),
                  emission=np.ones(3, np.float32), intensity=12.0)
    cam = np.eye(4, dtype=np.float32)
    cam[:3, 3] = [0, 0, 12]
    cam[:3, 2] = [0, 0, -1]

    imgs = {}
    for name, bufs in (("flat", flat), ("inst", inst)):
        bufs = bufs.replace(
            light_origin=jnp.asarray(light.origin[None]),
            light_eu=jnp.asarray(light.edge_u[None]),
            light_ev=jnp.asarray(light.edge_v[None]),
            light_emission=jnp.asarray(
                (light.emission * light.intensity)[None]),
            num_lights=1)
        r = Renderer((64, 64), RenderConfig(downsample_factor=1.0,
                                            denoise=False))
        r.set_resources(bufs)
        r.set_blit_mode(BlitMode.PATHTRACE)
        r.accumulate = True
        for _ in range(4):
            r.raytrace(cam)
        imgs[name] = np.asarray(r.state.accum)
    a, b = imgs["flat"], imgs["inst"]
    assert a.mean() > 1e-3
    assert abs(a.mean() - b.mean()) / a.mean() < 0.12
