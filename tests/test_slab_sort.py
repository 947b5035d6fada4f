"""Slab-local bitonic payload sort (ops/slab_sort.py). Interpret mode on
CPU; the same kernel compiles with Mosaic on TPU.

Design evidence: experiments/slab_sort_sim.py — 64k-slab sorting recovers
the global sort's packet coherence exactly (137.3 vs 137.4 steps/packet on
the arch-260k diffuse wave). As the FRAME regroup the kernel is a closed
negative result (lost the round-5 device A/B to argsort+gathers, see
render/integrator.py); it remains the archived treelet pipeline's regroup
primitive, tested here.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from loupiote_tpu.ops.slab_sort import slab_sort  # noqa: E402


def test_slab_sort_unique_keys_exact():
    rng = np.random.default_rng(1)
    R = 3000  # non-pow2, non-multiple of the slab -> exercises padding
    keys = rng.permutation(R).astype(np.int32)
    pay_f = rng.random(R).astype(np.float32)
    pay_i = rng.integers(0, 1 << 30, R).astype(np.int32)
    ks, (pf, pi) = slab_sort(jnp.asarray(keys),
                             [jnp.asarray(pay_f), jnp.asarray(pay_i)],
                             slab_log=10, interpret=True)
    ks, pf, pi = np.asarray(ks), np.asarray(pf), np.asarray(pi)
    slab = 1 << 10
    for s in range(0, R, slab):
        e = min(s + slab, R)
        order = np.argsort(keys[s:e], kind="stable")
        np.testing.assert_array_equal(ks[s:e], keys[s:e][order])
        np.testing.assert_array_equal(pf[s:e], pay_f[s:e][order])
        np.testing.assert_array_equal(pi[s:e], pay_i[s:e][order])


def test_slab_sort_duplicate_keys_grouped():
    rng = np.random.default_rng(2)
    R = 2048
    keys = rng.integers(0, 7, R).astype(np.int32)
    pay = np.arange(R, dtype=np.int32)
    ks, (p,) = slab_sort(jnp.asarray(keys), [jnp.asarray(pay)],
                         slab_log=10, interpret=True)
    ks, p = np.asarray(ks), np.asarray(p)
    slab = 1 << 10
    for s in range(0, R, slab):
        e = s + slab
        assert (np.diff(ks[s:e]) >= 0).all()
        # The (key, payload) multiset is preserved per slab.
        a = sorted(zip(keys[s:e], pay[s:e]))
        b = sorted(zip(ks[s:e], p[s:e]))
        assert a == b


def test_slab_sort_uint32_dead_keys_last():
    from loupiote_tpu.ops.sort import DEAD_KEY

    rng = np.random.default_rng(3)
    R = 1024
    keys = rng.integers(0, 1 << 30, R).astype(np.uint32)
    dead = rng.random(R) < 0.3
    keys[dead] = np.uint32(DEAD_KEY)
    alive = (~dead)
    ks, (al,) = slab_sort(jnp.asarray(keys),
                          [jnp.asarray(alive)], slab_log=10,
                          interpret=True)
    ks, al = np.asarray(ks), np.asarray(al)
    assert al.dtype == np.bool_
    n_alive = int(alive.sum())
    assert al[:n_alive].all() and not al[n_alive:].any()
    assert (np.diff(ks.astype(np.int64) & 0xFFFFFFFF) >= 0).all()


def test_sorted_frame_blue_noise_pixel_deterministic(cornell_buffers,
                                                     monkeypatch):
    """With blue-noise sampling, frame radiance must be bit-identical
    whether or not the inter-bounce sort runs (the pid routing keeps every
    pixel's noise columns attached through the permutation)."""
    from loupiote_tpu.render.integrator import trace_paths
    from loupiote_tpu.scene.blue_noise import generate_blue_noise

    import loupiote_tpu.render.integrator as integ

    bufs = cornell_buffers
    # Mirror Renderer.upload_noise_texture: 2 channels, centered floats.
    raw = generate_blue_noise()
    noise = jnp.asarray((raw[..., :2].astype(np.float32) + 0.5) / 256.0)
    cam = np.eye(4, dtype=np.float32)
    cam[:3, 3] = [0, 1, 6]
    cam[:3, 2] = [0, 0, -1]
    key = jax.random.PRNGKey(5)
    W = 128
    H = 64

    monkeypatch.setattr(integ, "_tiles_ok", lambda w, r: True)
    imgs = {}
    for name, force_nodes in (("nosort", 0), ("sorted", 16385)):
        # num_nodes gate: force the sort path on/off for the small scene.
        b = bufs.replace(num_nodes=max(bufs.num_nodes, force_nodes))
        rad, _ = trace_paths(b, jnp.asarray(cam), W, H, key, bounces=3,
                             noise_tex=noise,
                             frame_count=jnp.int32(1))
        imgs[name] = np.asarray(rad)
    assert imgs["nosort"].mean() > 1e-4
    np.testing.assert_allclose(imgs["sorted"], imgs["nosort"],
                               rtol=1e-5, atol=1e-6)
