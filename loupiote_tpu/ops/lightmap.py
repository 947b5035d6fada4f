"""Lightmap baking: the LightmapPass analog.

The reference constructs a ``LightmapPass`` but never dispatches it — a
latent feature (`crates/lib/src/renderer.rs:278`; `Passes.lightmap`). Here
the analog is functional: bake per-vertex irradiance (cosine-hemisphere
integrated incident radiance) for a mesh instance using the same traversal
+ shading machinery as the renderer. Useful for AO/irradiance caching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .intersect import intersect_any
from .sampling import cosine_sample_hemisphere, orthonormal_basis, to_world
from .shade import EPS_OFFSET, BounceState, shade_step


def bake_vertex_irradiance(scene, positions: jnp.ndarray,
                           normals: jnp.ndarray, key,
                           samples: int = 16, bounces: int = 2) -> jnp.ndarray:
    """Bake irradiance at (V,3) surface points with (V,3) normals.

    Returns (V, 3) linear irradiance (cosine-weighted incident radiance,
    i.e. what a white Lambertian surface would reflect times pi).
    """
    V = positions.shape[0]
    t, bt = orthonormal_basis(normals)
    total = jnp.zeros((V, 3))
    for s in range(samples):
        key, k_dir, k_trace = jax.random.split(key, 3)
        u1 = jax.random.uniform(k_dir, (V,))
        u2 = jax.random.uniform(jax.random.fold_in(k_dir, 1), (V,))
        wi = to_world(normals, t, bt, cosine_sample_hemisphere(u1, u2))
        ro = positions + normals * EPS_OFFSET

        state = BounceState(
            ro=ro, rd=wi,
            throughput=jnp.ones((V, 3)),
            radiance=jnp.zeros((V, 3)),
            alive=jnp.ones(V, jnp.bool_),
            bsdf_pdf=jnp.zeros(V),
            use_mis=jnp.zeros(V, jnp.bool_),
        )
        for _ in range(bounces):
            hit = intersect_any(scene, state.ro, state.rd, active=state.alive)
            key, k_step = jax.random.split(key)
            state, _ = shade_step(scene, state, hit, k_step, nee=True)
        # Cosine-weighted sampling: E ~= pi * mean(L_i).
        total = total + state.radiance
    return total * (jnp.pi / samples)
