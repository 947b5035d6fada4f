"""Sampling math: orthonormal bases, cosine hemisphere, GGX microfacets.

PBRT-style building blocks for the shading pass (the reference cites the PBR
book and Karis 2013 as its own kernel references, README.md:36-42). All
functions are batched over the leading ray dimension and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

INV_PI = 1.0 / jnp.pi


def orthonormal_basis(n: jnp.ndarray):
    """Branchless ONB from unit normals (Duff et al. 2017). n: (R,3)."""
    s = jnp.where(n[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t = jnp.stack([1.0 + s * n[:, 0] * n[:, 0] * a, s * b, -s * n[:, 0]], axis=1)
    bt = jnp.stack([b, s + n[:, 1] * n[:, 1] * a, -n[:, 1]], axis=1)
    return t, bt


def to_world(n, t, bt, local):
    """Local (x,y,z) -> world given basis (t, bt, n)."""
    return (t * local[:, 0:1] + bt * local[:, 1:2] + n * local[:, 2:3])


def cosine_sample_hemisphere(u1, u2):
    """Cosine-weighted local direction; pdf = cos/pi. Returns (R,3)."""
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    return jnp.stack([x, y, z], axis=1)


def ggx_d(n_dot_h, alpha):
    a2 = alpha * alpha
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * d * d, 1e-12)


def smith_g1(n_dot_v, alpha):
    a2 = alpha * alpha
    nv = jnp.maximum(n_dot_v, 1e-6)
    return 2.0 * nv / (nv + jnp.sqrt(a2 + (1.0 - a2) * nv * nv))


def smith_g2(n_dot_v, n_dot_l, alpha):
    return smith_g1(n_dot_v, alpha) * smith_g1(n_dot_l, alpha)


def fresnel_schlick(cos_theta, f0):
    """f0: (R,3) or scalar; cos_theta: (R,)."""
    m = jnp.clip(1.0 - cos_theta, 0.0, 1.0)
    m2 = m * m
    return f0 + (1.0 - f0) * (m2 * m2 * m)[:, None]


def sample_ggx_vndf(wo_local, alpha, u1, u2):
    """Sample the GGX visible-normal distribution (Heitz 2018).

    wo_local: (R,3) view dir in local (tangent) space, z up. Returns half
    vectors (R,3). pdf_h = G1(wo) * D(h) * dot(wo,h) / cos_theta_o.
    """
    v = jnp.stack([wo_local[:, 0] * alpha, wo_local[:, 1] * alpha, wo_local[:, 2]], axis=1)
    v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    lensq = v[:, 0] ** 2 + v[:, 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-20))
    t1 = jnp.where((lensq > 1e-12)[:, None],
                   jnp.stack([-v[:, 1] * inv, v[:, 0] * inv, jnp.zeros_like(inv)], axis=1),
                   jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), v.shape))
    t2 = jnp.cross(v, t1)
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + v[:, 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = t1 * p1[:, None] + t2 * p2[:, None] + v * p3[:, None]
    h = jnp.stack([alpha * nh[:, 0], alpha * nh[:, 1], jnp.maximum(nh[:, 2], 1e-6)], axis=1)
    return h / jnp.linalg.norm(h, axis=1, keepdims=True)


def reflect(d, n):
    """Reflect direction d about normal n (both (R,3))."""
    return d - 2.0 * jnp.sum(d * n, axis=1, keepdims=True) * n


def luminance(rgb):
    return 0.2126 * rgb[:, 0] + 0.7152 * rgb[:, 1] + 0.0722 * rgb[:, 2]


def power_heuristic(pdf_a, pdf_b):
    """Power heuristic (beta=2) MIS weight for strategy a."""
    a2 = pdf_a * pdf_a
    return a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-20)
