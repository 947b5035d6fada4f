"""Integrator + Renderer tests: furnace closure, Cornell statistics,
progressive accumulation semantics."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from loupiote_tpu.config import BlitMode, RenderConfig
from loupiote_tpu.render import Renderer, trace_paths
from loupiote_tpu.render.camera import CameraController
from loupiote_tpu.scene import Light, Scene, build_probe, build_scene_buffers
from loupiote_tpu.scene.types import Instance, Mesh


def look_at_matrix(origin, forward):
    fwd = np.asarray(forward, np.float32)
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0])
    right = right / np.linalg.norm(right)
    up = np.cross(right, fwd)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up, fwd, origin
    return m


def cornell_with_light(cornell_scene):
    import copy

    s = copy.copy(cornell_scene)
    s.lights = [Light(
        origin=np.array([-1.0, 3.55, -0.8], np.float32),
        edge_u=np.array([2.0, 0.0, 0.0], np.float32),
        edge_v=np.array([0.0, 0.0, 1.6], np.float32),
        emission=np.array([1.0, 1.0, 1.0], np.float32), intensity=20.0)]
    return s


CORNELL_CAM = look_at_matrix([0, 0.6, 12.0], [0, 0, -1])


def test_furnace_empty_env():
    probe = build_probe(np.ones((8, 16, 3), np.float32))
    s = Scene.default()
    s.lights = []
    bufs = build_scene_buffers(s, probe=probe)
    rad, gb = trace_paths(bufs, jnp.asarray(np.eye(4, dtype=np.float32)),
                          16, 16, jr.PRNGKey(0), bounces=2)
    np.testing.assert_allclose(np.asarray(rad), 1.0, atol=1e-5)
    assert (np.asarray(gb.mesh_id) == -1).all()


def test_furnace_diffuse_plane():
    """White Lambertian plane under a uniform unit env reflects ~1."""
    probe = build_probe(np.ones((8, 16, 3), np.float32))
    s = Scene.default()
    s.lights = []
    q = 50.0
    pos = np.array([[-q, 0, -q], [q, 0, -q], [q, 0, q], [-q, 0, q]], np.float32)
    s.meshes.append(Mesh(pos, np.tile([[0, 1, 0]], (4, 1)).astype(np.float32),
                         None, np.array([0, 1, 2, 0, 2, 3], np.uint32)))
    s.instances.append(Instance(0, np.eye(4, dtype=np.float32), 0))
    bufs = build_scene_buffers(s, probe=probe)
    cam = look_at_matrix([0, 3, 0], [0, -1, -0.3])
    acc = 0.0
    n = 8
    for i in range(n):
        rad, _ = trace_paths(bufs, jnp.asarray(cam), 16, 16, jr.PRNGKey(i), bounces=4)
        acc = acc + np.asarray(rad)
    acc /= n
    assert abs(acc.mean() - 1.0) < 0.05
    assert acc.max() < 2.0  # no fireflies


@pytest.fixture(scope="module")
def cornell_bufs(cornell_scene):
    return build_scene_buffers(cornell_with_light(cornell_scene))


def test_cornell_color_bleeding(cornell_bufs):
    w = h = 48
    acc = 0.0
    n = 6
    for i in range(n):
        rad, _ = trace_paths(cornell_bufs, jnp.asarray(CORNELL_CAM), w, h,
                             jr.PRNGKey(i), bounces=3)
        acc = acc + np.asarray(rad).reshape(h, w, 3)
    acc /= n
    assert acc.mean() > 0.01, "image is black"
    left = acc[h // 4: 3 * h // 4, : w // 4]
    right = acc[h // 4: 3 * h // 4, 3 * w // 4:]
    # Red wall on the left, green wall on the right.
    assert left[..., 0].mean() > 1.5 * left[..., 1].mean()
    assert right[..., 1].mean() > 1.5 * right[..., 0].mean()


def test_cornell_gbuffer(cornell_bufs):
    w = h = 32
    _, gb = trace_paths(cornell_bufs, jnp.asarray(CORNELL_CAM), w, h,
                        jr.PRNGKey(0), bounces=1)
    mesh = np.asarray(gb.mesh_id).reshape(h, w)
    depth = np.asarray(gb.depth).reshape(h, w)
    # Center pixels hit the box interior.
    assert (mesh[h // 2, w // 2] >= 0)
    assert 5.0 < depth[h // 2, w // 2] < 25.0
    nrm = np.asarray(gb.normal).reshape(h, w, 3)
    hit = mesh >= 0
    lens = np.linalg.norm(nrm[hit], axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-3)


def test_renderer_accumulation_semantics(cornell_bufs):
    r = Renderer((64, 64), RenderConfig(downsample_factor=0.5, denoise=False))
    assert r.get_size() == (32, 32)
    r.set_resources(cornell_bufs)

    # Not accumulating: frame_count stays 1 (renderer.rs:523-537).
    r.raytrace(CORNELL_CAM)
    assert int(r.state.frame_count) == 1
    img1 = r.blit()

    r.accumulate = True
    r.raytrace(CORNELL_CAM)
    assert int(r.state.frame_count) == 2
    r.raytrace(CORNELL_CAM)
    assert int(r.state.frame_count) == 3

    r.reset_accumulation()
    assert int(r.state.frame_count) == 1
    # Reference parity: reset only restarts the average; the accumulate
    # toggle is app-owned (renderer.rs:609-618 does not touch it).
    assert r.accumulate is True

    # Display parity (renderer.rs:225,551-607): internal render at 0.5x,
    # blit upscales to the window resolution.
    assert img1.shape == (64, 64, 3) and img1.dtype == np.uint8
    assert r.blit(display_size=False).shape == (32, 32, 3)
    rgba = np.frombuffer(r.read_pixels(), np.uint8)
    assert rgba.size == 64 * 64 * 4


def test_renderer_no_scene_noop():
    r = Renderer((32, 32), RenderConfig(denoise=False))
    r.raytrace(np.eye(4, dtype=np.float32))  # must not raise (renderer.rs:404)
    assert int(r.state.frame_count) == 1


def test_read_pixels(cornell_bufs):
    r = Renderer((32, 32), RenderConfig(downsample_factor=1.0, denoise=False))
    r.set_resources(cornell_bufs)
    r.raytrace(CORNELL_CAM)
    data = r.read_pixels()
    assert len(data) == 32 * 32 * 4
    rgba = np.frombuffer(data, np.uint8).reshape(32, 32, 4)
    assert (rgba[..., 3] == 255).all()


def test_camera_controller_matches_reference_semantics():
    c = CameraController.from_origin_dir([0, 0, 0], [0, 0, -1])
    assert c.is_static()
    m = c.update(0.016)
    # Columns are orthonormal right/up/forward.
    basis = m[:3, :3]
    np.testing.assert_allclose(basis.T @ basis, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(m[:3, 2], [0, 0, -1], atol=1e-6)

    from loupiote_tpu.render.camera import CameraMoveCommand

    c.set_command(CameraMoveCommand.FORWARD)
    c.update(0.1)
    assert not c.is_static()
    assert c.origin[2] < 0  # moved along forward (-z)
    c.unset_command(CameraMoveCommand.FORWARD)
    for _ in range(200):
        c.update(0.1)
    assert c.is_static()  # damping settles


def test_blit_modes(cornell_bufs):
    r = Renderer((32, 32), RenderConfig(downsample_factor=1.0, denoise=False))
    r.set_resources(cornell_bufs)
    r.raytrace(CORNELL_CAM)
    for mode in (BlitMode.PATHTRACE, BlitMode.GBUFFER, BlitMode.MOTION_VECTOR):
        r.set_blit_mode(mode)
        img = r.blit()
        assert img.shape == (32, 32, 3)
    # Static camera two frames -> zero motion vectors.
    r.raytrace(CORNELL_CAM)
    r.set_blit_mode(BlitMode.MOTION_VECTOR)
    mv = np.asarray(r.state.motion)
    # Static camera: motion is bounded by the sub-pixel AA jitter.
    assert np.abs(mv).max() <= 1.5 / 32


def test_spp_batched_matches_separate_frames_blue_noise(cornell_bufs,
                                                        monkeypatch):
    """spp=2 in ONE batched wave must reproduce the mean of the two 1spp
    frames it replaces bit-closely: sample s draws every blue-noise
    dimension at effective frame index frame_count*spp + s, and the final
    pixel scatter-add averages exactly. Run with the inter-bounce sort
    both off (small-scene default) and forced on (the permutation must
    keep each slot's noise columns attached via pid)."""
    from loupiote_tpu.render.renderer import blue_noise_uv
    from loupiote_tpu.scene.blue_noise import generate_blue_noise

    import loupiote_tpu.render.integrator as integ

    raw = generate_blue_noise()
    noise = jnp.asarray((raw[..., :2].astype(np.float32) + 0.5) / 256.0)
    W, H = 128, 48
    key = jr.PRNGKey(7)
    fc = jnp.int32(3)
    monkeypatch.setattr(integ, "_tiles_ok", lambda w, r: True)
    for force_nodes in (0, 16385):
        bufs = cornell_bufs.replace(
            num_nodes=max(cornell_bufs.num_nodes, force_nodes))
        batched, gb2 = trace_paths(bufs, jnp.asarray(CORNELL_CAM), W, H,
                                   key, bounces=3, noise_tex=noise,
                                   frame_count=fc, spp=2)
        singles, gbs = [], []
        for s in range(2):
            fcs = fc * 2 + s
            jit = blue_noise_uv(noise, fcs, W, H, dim=0)
            rad, gb1 = trace_paths(bufs, jnp.asarray(CORNELL_CAM), W, H,
                                   key, bounces=3, noise_tex=noise,
                                   frame_count=fcs, jitter=jit)
            singles.append(np.asarray(rad))
            gbs.append(gb1)
        want = (singles[0] + singles[1]) / 2
        assert want.mean() > 1e-4
        np.testing.assert_allclose(np.asarray(batched), want,
                                   rtol=1e-5, atol=1e-6)
        # G-buffer is sample 0's, at pixel resolution.
        np.testing.assert_allclose(np.asarray(gb2.depth),
                                   np.asarray(gbs[0].depth),
                                   rtol=1e-5, atol=1e-5)


def test_spp_prng_statistical(cornell_bufs):
    """PRNG path: one spp=4 wave is statistically the mean of 4 frames."""
    w = h = 48
    rad4, _ = trace_paths(cornell_bufs, jnp.asarray(CORNELL_CAM), w, h,
                          jr.PRNGKey(0), bounces=2, spp=4)
    acc = 0.0
    for i in range(4):
        rad, _ = trace_paths(cornell_bufs, jnp.asarray(CORNELL_CAM), w, h,
                             jr.PRNGKey(10 + i), bounces=2)
        acc = acc + np.asarray(rad)
    acc /= 4
    a, b = np.asarray(rad4).mean(), acc.mean()
    assert a > 1e-3
    assert abs(a - b) / b < 0.15


def test_renderer_samples_per_frame(cornell_bufs):
    """Config plumbing: samples_per_frame=2 renders and accumulates."""
    r = Renderer((32, 32), RenderConfig(downsample_factor=1.0,
                                        denoise=False,
                                        samples_per_frame=2))
    r.set_resources(cornell_bufs)
    r.accumulate = True
    for _ in range(2):
        r.raytrace(CORNELL_CAM)
    img = r.blit()
    assert img.shape == (32, 32, 3)
    assert img.mean() > 2


def test_aot_executable_cache(tmp_path):
    """render/aot.py: the compiled frame executable round-trips through
    the on-disk cache ACROSS PROCESSES — the second process loads in lieu
    of compiling (the warm-startup path, VERDICT r4 #4; device numbers in
    artifacts/r5_device3/aot_probe.log). Runs in subprocesses with a
    single CPU device: the AOT path is single-device by design (the
    Renderer falls back to jit on multi-device hosts, so the in-process
    8-device test env cannot exercise it)."""
    import os
    import subprocess
    import sys

    script = r'''
import sys, json
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import loupiote_tpu as lt
from loupiote_tpu.render import Renderer
from loupiote_tpu.config import RenderConfig
from loupiote_tpu.scene import Light

scene = lt.Scene.default()
lt.load_gltf_path("/root/reference/assets/cornell-box.glb", scene)
scene.lights = [Light(origin=np.array([-1,3.55,-.8],np.float32),
    edge_u=np.array([2.,0,0],np.float32), edge_v=np.array([0,0,1.6],np.float32),
    emission=np.array([1.,.95,.9],np.float32), intensity=20.0)]
bufs = lt.build_scene_buffers(scene)
r = Renderer((24, 24), RenderConfig(downsample_factor=1.0, denoise=False,
                                    bounces_moving=2))
r.enable_aot_cache(sys.argv[1])
r.set_resources(bufs)
cam = np.eye(4, dtype=np.float32); cam[:3,2]=[0,0,-1]; cam[:3,3]=[0,.6,12]
r.raytrace(cam)
img = r.blit()
print(json.dumps({"aot_set": r._aot is not None,
                  "loaded": bool(r._aot_loaded),
                  "mean": float(img.mean())}))
'''
    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    out = []
    for _ in range(2):
        p = subprocess.run([sys.executable, "-c", script, str(tmp_path)],
                           capture_output=True, text=True, timeout=600,
                           env=env, cwd="/root/repo")
        assert p.returncode == 0, p.stderr[-800:]
        import json as _json

        out.append(_json.loads(p.stdout.strip().splitlines()[-1]))
    assert out[0]["aot_set"] and not out[0]["loaded"]  # compiled + saved
    assert out[1]["aot_set"] and out[1]["loaded"]  # cross-process load
    assert len(list(tmp_path.glob("*.aot"))) == 1
    # Same seed + same executable -> identical frames both ways.
    assert out[0]["mean"] == out[1]["mean"] > 2.0


def test_packed_permute_bit_identical(cornell_bufs, monkeypatch):
    """LOUPIOTE_PACKED_PERMUTE applies the same permutation via two packed
    matrix gathers — the frame must be bit-identical to the per-column
    permute, and LOUPIOTE_SORT_MAX=1 must change only statistics (same
    estimator), not determinism under blue noise."""
    from loupiote_tpu.scene.blue_noise import generate_blue_noise

    import loupiote_tpu.render.integrator as integ

    raw = generate_blue_noise()
    noise = jnp.asarray((raw[..., :2].astype(np.float32) + 0.5) / 256.0)
    monkeypatch.setattr(integ, "_tiles_ok", lambda w, r: True)
    bufs = cornell_bufs.replace(num_nodes=max(cornell_bufs.num_nodes, 16385))
    W, H = 128, 48

    def frame():
        rad, _ = trace_paths(bufs, jnp.asarray(CORNELL_CAM), W, H,
                             jr.PRNGKey(3), bounces=3, noise_tex=noise,
                             frame_count=jnp.int32(2))
        return np.asarray(rad)

    monkeypatch.setenv("LOUPIOTE_PACKED_PERMUTE", "0")  # per-column ref
    want = frame()
    assert want.mean() > 1e-4
    monkeypatch.setenv("LOUPIOTE_PACKED_PERMUTE", "1")  # shipped default
    np.testing.assert_array_equal(frame(), want)

    # sort_max=1: still a valid estimator (pid routing intact), means close.
    monkeypatch.setenv("LOUPIOTE_SORT_MAX", "1")
    got = frame()
    np.testing.assert_array_equal(got, want)  # same noise, same paths
    monkeypatch.delenv("LOUPIOTE_SORT_MAX", raising=False)


def test_shadow_sort_bit_identical(cornell_bufs, monkeypatch):
    """LOUPIOTE_SHADOW_SORT routes occlusion waves through their own
    Morton order (packed gather + bool scatter-back) — blocked bits, and
    therefore the frame, must be bit-identical."""
    from loupiote_tpu.scene.blue_noise import generate_blue_noise

    import loupiote_tpu.render.integrator as integ

    raw = generate_blue_noise()
    noise = jnp.asarray((raw[..., :2].astype(np.float32) + 0.5) / 256.0)
    monkeypatch.setattr(integ, "_tiles_ok", lambda w, r: True)
    bufs = cornell_bufs.replace(num_nodes=max(cornell_bufs.num_nodes, 16385))

    def frame():
        rad, _ = trace_paths(bufs, jnp.asarray(CORNELL_CAM), 128, 48,
                             jr.PRNGKey(4), bounces=3, noise_tex=noise,
                             frame_count=jnp.int32(5))
        return np.asarray(rad)

    monkeypatch.setenv("LOUPIOTE_SHADOW_SORT", str(1 << 30))  # off (ref)
    want = frame()
    assert want.mean() > 1e-4
    monkeypatch.setenv("LOUPIOTE_SHADOW_SORT", "0")  # shipped default
    np.testing.assert_array_equal(frame(), want)
