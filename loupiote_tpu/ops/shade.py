"""BSDF shading + next-event estimation: the ShadingPass analog.

Reference behavior: ``ShadingPass`` consumes intersections + surface
resources (materials, probe, atlas, noise) and advances each per-pixel ray
one bounce, accumulating radiance into the ray record
(`crates/lib/src/renderer.rs:484-510`; kernels unmounted — semantics rebuilt
PBRT-style per the reference's own citations, README.md:36-42).

Model: PBR metallic-roughness.
  - diffuse lobe: Lambert, weighted (1 - metallic) * (1 - F)
  - specular lobe: GGX (Trowbridge-Reitz) with Smith G, Schlick Fresnel,
    F0 = mix(0.04, base_color, metallic), sampled via visible-NDF
  - NEE: one quad-light sample + (when a probe is bound) one env CDF sample,
    both MIS-weighted (power heuristic) against BSDF sampling
  - quad lights are not in the BVH; BSDF rays hit them analytically
    (intersect_lights) and the env is evaluated on geometry miss.

All functions operate on flat (R,) SoA ray batches inside jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .env import env_pdf, eval_env, sample_env
from .intersect import T_FAR, Hit, occluded
from .sampling import (cosine_sample_hemisphere, fresnel_schlick, ggx_d,
                       luminance, orthonormal_basis, power_heuristic, reflect,
                       sample_ggx_vndf, smith_g1, smith_g2, to_world)
from .texture import sample_atlas

INV_PI = 1.0 / jnp.pi
EPS_OFFSET = 1e-3
MIN_ALPHA = 1e-3


class Surface(NamedTuple):
    """Decoded hit-point attributes."""

    pos: jnp.ndarray  # (R,3)
    n_geom: jnp.ndarray  # (R,3) geometric normal (faces the incoming ray)
    n_shade: jnp.ndarray  # (R,3) shading normal
    albedo: jnp.ndarray  # (R,3) linear base color
    alpha_tex: jnp.ndarray  # (R,) base color alpha
    roughness: jnp.ndarray  # (R,)
    metallic: jnp.ndarray  # (R,)
    emission: jnp.ndarray  # (R,3)
    mat_id: jnp.ndarray  # (R,) int32
    inst_id: jnp.ndarray  # (R,) int32


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def decode_surface(scene, ro, rd, hit: Hit, textures: bool = True) -> Surface:
    """Fetch and interpolate attributes for hit rays (masked-safe).

    One packed row gather per triangle (tri_shade) + geometry row
    (tri_pack) + one per material (mat_pack): TPU gathers cost ~per-row,
    so packing beats the naive 11-gather attribute fetch ~5x at 1080p.
    """
    tri = jnp.maximum(hit.tri, 0)
    w = 1.0 - hit.u - hit.v
    b = (w[:, None], hit.u[:, None], hit.v[:, None])

    srow = scene.tri_shade[tri]  # (R, 20)
    n0, n1, n2 = srow[:, 0:3], srow[:, 3:6], srow[:, 6:9]
    uv0, uv1, uv2 = srow[:, 9:11], srow[:, 11:13], srow[:, 13:15]
    mat = _i32(srow[:, 15])
    inst = _i32(srow[:, 16])
    ng = srow[:, 17:20]  # precomputed unit geometric normal

    n = n0 * b[0] + n1 * b[1] + n2 * b[2]
    uv = uv0 * b[0] + uv1 * b[1] + uv2 * b[2]

    # Two-level BLAS/TLAS scenes: attributes are OBJECT-space per mesh;
    # the instance supplies the normal matrix and material
    # (scene/instanced.py; reference instances carry material + transform,
    # gltf.rs:129-148).
    if getattr(scene, "inst_w2o", None) is not None and hit.inst is not None:
        inst = jnp.maximum(hit.inst, 0)
        nm = scene.inst_nmat[inst]  # (R, 3, 3)
        n = jnp.einsum("rij,rj->ri", nm, n)
        ng = jnp.einsum("rij,rj->ri", nm, ng)
        ng = ng / jnp.maximum(jnp.linalg.norm(ng, axis=1, keepdims=True),
                              1e-12)
        mat = scene.inst_mat_id[inst]
        inst = hit.inst

    n = n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True), 1e-12)

    # Two-sided: orient both normals against the incoming direction
    # (the reference scene materials are doubleSided).
    flip = jnp.sum(ng * rd, axis=1) > 0.0
    ng = jnp.where(flip[:, None], -ng, ng)
    n = jnp.where((jnp.sum(n * rd, axis=1) > 0.0)[:, None], -n, n)

    mrow = scene.mat_pack[mat]  # (R, 11)
    base = mrow[:, 0:4]
    rough = mrow[:, 4]
    metal = mrow[:, 5]
    emission = mrow[:, 6:9]
    albedo = base[:, :3]
    alpha_tex = base[:, 3]

    if textures:
        albedo_tex_id = _i32(mrow[:, 9])
        mra_tex_id = _i32(mrow[:, 10])
        tex_albedo = sample_atlas(scene, albedo_tex_id, uv, srgb=True)
        tex_mra = sample_atlas(scene, mra_tex_id, uv, srgb=False)
        albedo = albedo * tex_albedo[:, :3]
        alpha_tex = alpha_tex * tex_albedo[:, 3]
        # glTF metallic-roughness: G = roughness, B = metallic.
        rough = rough * tex_mra[:, 1]
        metal = metal * tex_mra[:, 2]

    pos = ro + rd * hit.t[:, None]
    return Surface(pos, ng, n, albedo, alpha_tex, rough, metal, emission,
                   mat, inst)


def bsdf_eval_pdf(surf: Surface, wo, wi):
    """Evaluate f(wo, wi) (R,3) and pdf (R,) for the metallic-roughness BSDF.

    wo: direction toward camera (= -ray dir), wi: sampled light direction,
    both world-space unit. Returns (f, pdf); zero when wi is below the
    shading hemisphere.
    """
    n = surf.n_shade
    n_dot_o = jnp.sum(n * wo, axis=1)
    n_dot_i = jnp.sum(n * wi, axis=1)
    valid = (n_dot_i > 0.0) & (n_dot_o > 0.0)

    h = wo + wi
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=1, keepdims=True), 1e-12)
    n_dot_h = jnp.clip(jnp.sum(n * h, axis=1), 0.0, 1.0)
    o_dot_h = jnp.clip(jnp.sum(wo * h, axis=1), 1e-6, 1.0)

    alpha = jnp.maximum(surf.roughness * surf.roughness, MIN_ALPHA)
    f0 = 0.04 * (1.0 - surf.metallic[:, None]) + surf.albedo * surf.metallic[:, None]
    F = fresnel_schlick(o_dot_h, f0)
    D = ggx_d(n_dot_h, alpha)
    G = smith_g2(n_dot_o, n_dot_i, alpha)

    spec = F * (D * G / jnp.maximum(4.0 * n_dot_o * n_dot_i, 1e-9))[:, None]
    kd = (1.0 - surf.metallic)[:, None] * (1.0 - F)
    diff = kd * surf.albedo * INV_PI
    f = jnp.where(valid[:, None], diff + spec, 0.0)

    p_spec = _spec_select_prob(surf, n_dot_o)
    # VNDF pdf: G1(wo) D / (4 n.o) ; diffuse pdf: cos / pi.
    pdf_spec = smith_g1(n_dot_o, alpha) * D / jnp.maximum(4.0 * n_dot_o, 1e-9)
    pdf_diff = jnp.maximum(n_dot_i, 0.0) * INV_PI
    pdf = jnp.where(valid, p_spec * pdf_spec + (1.0 - p_spec) * pdf_diff, 0.0)
    return f, pdf


def _spec_select_prob(surf: Surface, n_dot_o):
    """Probability of sampling the specular lobe (Fresnel-luminance based)."""
    f0 = 0.04 * (1.0 - surf.metallic[:, None]) + surf.albedo * surf.metallic[:, None]
    f_avg = luminance(fresnel_schlick(jnp.maximum(n_dot_o, 0.0), f0))
    d_avg = luminance(surf.albedo) * (1.0 - surf.metallic)
    return jnp.clip(f_avg / jnp.maximum(f_avg + d_avg, 1e-6), 0.05, 0.95)


def sample_bsdf(surf: Surface, wo, u_lobe, u1, u2):
    """Sample wi from the BSDF. Returns (wi, f, pdf)."""
    n = surf.n_shade
    t, bt = orthonormal_basis(n)
    n_dot_o = jnp.sum(n * wo, axis=1)
    wo_local = jnp.stack([jnp.sum(t * wo, axis=1), jnp.sum(bt * wo, axis=1),
                          n_dot_o], axis=1)

    alpha = jnp.maximum(surf.roughness * surf.roughness, MIN_ALPHA)
    p_spec = _spec_select_prob(surf, n_dot_o)

    # Specular candidate: VNDF half-vector reflect.
    h_local = sample_ggx_vndf(wo_local, alpha, u1, u2)
    h_world = to_world(n, t, bt, h_local)
    wi_spec = reflect(-wo, h_world)

    # Diffuse candidate: cosine hemisphere.
    wi_diff = to_world(n, t, bt, cosine_sample_hemisphere(u1, u2))

    take_spec = u_lobe < p_spec
    wi = jnp.where(take_spec[:, None], wi_spec, wi_diff)
    f, pdf = bsdf_eval_pdf(surf, wo, wi)
    return wi, f, pdf


def scene_exit_t(scene, ro, rd):
    """Distance at which each ray exits the root AABB — a tight tmax for
    env/sky shadow rays (all geometry lives inside the root box, so any
    occluder hit satisfies t <= exit_t). Replaces the former 0.5*T_FAR
    bound, letting any-hit packets prune nodes beyond the scene and retire
    sooner (VERDICT r1 weak #9)."""
    lo = scene.node_min[0]
    hi = scene.node_max[0]
    inv = 1.0 / jnp.where(jnp.abs(rd) > 1e-20, rd,
                          jnp.where(rd >= 0, 1e-20, -1e-20))
    t1 = (lo - ro) * inv
    t2 = (hi - ro) * inv
    tfar = jnp.min(jnp.maximum(t1, t2), axis=1)
    return jnp.maximum(tfar, 0.0) * 1.001 + 1e-2


def intersect_lights(scene, ro, rd, t_geo):
    """Analytic ray-vs-quad-light test against all lights.

    Returns (radiance_hit (R,3), pdf_area_sa (R,), t (R,), hit_any (R,))
    for the nearest light in front of the geometry hit distance ``t_geo``.
    """
    R = ro.shape[0]
    best_t = jnp.full(R, T_FAR)
    best_emit = jnp.zeros((R, 3))
    best_pdf = jnp.zeros(R)
    nl = max(scene.num_lights, 0)
    for li in range(nl):
        o = scene.light_origin[li]
        eu = scene.light_eu[li]
        ev = scene.light_ev[li]
        nrm = jnp.cross(eu, ev)
        area = jnp.linalg.norm(nrm)
        nrm_u = nrm / jnp.maximum(area, 1e-12)
        denom = jnp.sum(rd * nrm_u, axis=1)
        t = jnp.sum((o - ro) * nrm_u, axis=1) / jnp.where(
            jnp.abs(denom) > 1e-9, denom, 1e-9)
        p = ro + rd * t[:, None]
        rel = p - o
        # Project onto the (possibly non-orthogonal) edge basis.
        uu = jnp.sum(eu * eu)
        vv = jnp.sum(ev * ev)
        uv_ = jnp.sum(eu * ev)
        pu = jnp.sum(rel * eu, axis=1)
        pv = jnp.sum(rel * ev, axis=1)
        det = uu * vv - uv_ * uv_
        a = (pu * vv - pv * uv_) / jnp.maximum(det, 1e-12)
        b = (pv * uu - pu * uv_) / jnp.maximum(det, 1e-12)
        inside = (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1)
        ok = inside & (t > 1e-4) & (t < t_geo) & (t < best_t) & (jnp.abs(denom) > 1e-9)
        # Solid-angle pdf of NEE having produced this direction.
        cos_l = jnp.abs(denom)
        pdf_sa = (t * t) / jnp.maximum(cos_l * area, 1e-9) / max(nl, 1)
        best_emit = jnp.where(ok[:, None], scene.light_emission[li], best_emit)
        best_pdf = jnp.where(ok, pdf_sa, best_pdf)
        best_t = jnp.where(ok, t, best_t)
    return best_emit, best_pdf, best_t, best_t < T_FAR


def sample_light(scene, surf_pos, u_sel, u1, u2):
    """NEE: sample a point on a uniformly-chosen quad light.

    Returns (wi (R,3), dist (R,), emitted (R,3), pdf_sa (R,)).
    """
    nl = max(scene.num_lights, 1)
    if nl == 1:
        # Single light (the common case): broadcast instead of gathering.
        R = surf_pos.shape[0]
        o = jnp.broadcast_to(scene.light_origin[0], (R, 3))
        eu = jnp.broadcast_to(scene.light_eu[0], (R, 3))
        ev = jnp.broadcast_to(scene.light_ev[0], (R, 3))
        emit = jnp.broadcast_to(scene.light_emission[0], (R, 3))
    else:
        li = jnp.minimum((u_sel * nl).astype(jnp.int32), nl - 1)
        o = scene.light_origin[li]
        eu = scene.light_eu[li]
        ev = scene.light_ev[li]
        emit = scene.light_emission[li]
    q = o + eu * u1[:, None] + ev * u2[:, None]
    nrm = jnp.cross(eu, ev)
    area = jnp.linalg.norm(nrm, axis=1)
    nrm_u = nrm / jnp.maximum(area[:, None], 1e-12)

    delta = q - surf_pos
    dist = jnp.linalg.norm(delta, axis=1)
    wi = delta / jnp.maximum(dist[:, None], 1e-12)
    cos_l = jnp.abs(jnp.sum(nrm_u * -wi, axis=1))  # two-sided emitter
    pdf_sa = (dist * dist) / jnp.maximum(cos_l * area, 1e-9) / nl
    return wi, dist, emit, pdf_sa


class BounceState(NamedTuple):
    ro: jnp.ndarray  # (R,3)
    rd: jnp.ndarray  # (R,3)
    throughput: jnp.ndarray  # (R,3)
    radiance: jnp.ndarray  # (R,3)
    alive: jnp.ndarray  # (R,) bool
    bsdf_pdf: jnp.ndarray  # (R,) pdf of the dir that produced this ray
    use_mis: jnp.ndarray  # (R,) bool: ray came from a MIS-aware BSDF sample


def _occluded_sorted(scene, o, d, dist, active):
    """Run an occlusion wave in its OWN Morton/octant order.

    Shadow origins are the bounce's hit points — one scatter step less
    coherent than the sorted continuation order the wave otherwise runs
    in (measured: the bounce-2 shadow wave costs 276.7 ms vs 112 ms for
    the same-size saved sorted wave, artifacts/r5_device5/arch_trace2.log
    vs kernel_ab_shadow.log). One packed (R,8) gather permutes the ray,
    one bool scatter returns the blocked bits. DEFAULT at every bounce
    after the frame-level device A/B won -14.8% (see _shadow_sort_bounce
    below); LOUPIOTE_SHADOW_SORT raises the threshold / disables."""
    from .intersect import occluded
    from .sort import ray_sort_key, sort_order

    order = sort_order(ray_sort_key(o, d, active, scene.node_min[0],
                                    scene.node_max[0]))
    mat = jnp.concatenate(
        [o, d, dist[:, None], active.astype(jnp.float32)[:, None]],
        axis=1)[order]
    blocked_s = occluded(scene, mat[:, 0:3], mat[:, 3:6], mat[:, 6],
                         active=mat[:, 7] > 0)
    return jnp.zeros_like(blocked_s).at[order].set(blocked_s)


def _shadow_sort_bounce() -> int:
    """Sort occlusion waves from this bounce index on.

    DEFAULT 0 (every bounce) after the frame-level device A/B: self-
    sorting saved 144/214/238 ms at thresholds 2/1/0 on the 1611 ms
    arch-260k frame (-14.8% at 0; artifacts/r5_device7/
    frame_shadow_ab.log). LOUPIOTE_SHADOW_SORT=<B> restores a later
    threshold (big values disable). Applies only to scenes past the
    same num_nodes gate as the inter-bounce sort."""
    import os

    return int(os.environ.get("LOUPIOTE_SHADOW_SORT", 0))


def shade_step(scene, state: BounceState, hit: Hit, key, nee: bool = True,
               last: bool = False,
               light_uv: jnp.ndarray | None = None,
               bsdf_uv: jnp.ndarray | None = None,
               lobe_u: jnp.ndarray | None = None,
               bounce: int = 0):
    """Advance every ray one bounce. Returns (BounceState, Surface).

    ``last``: this is the path's final vertex. Without care the NEE here is
    MIS-weighted against a BSDF continuation that is never traced,
    systematically losing the BSDF-weighted share of direct light (ADVICE
    r1). Fix: a *final gather* — the continuation ray is tested against the
    analytic light quads + env with ONE any-hit occlusion query (per-ray
    tmax = light distance, or unbounded for env), so every MIS pair stays
    complete with normal power-heuristic weights. (Full NEE weight instead
    would reintroduce the 1/d^2 near-light firefly that MIS damps.)

    ``light_uv``/``bsdf_uv``/``lobe_u``: optional low-discrepancy draws
    replacing the PRNG for the quad-light surface point, the BSDF sample
    pair, and the lobe-selection scalar (blue-noise shading dimensions,
    reference renderer.rs:666-673).
    """
    ro, rd = state.ro, state.rd
    alive = state.alive
    miss = (hit.tri < 0) & alive
    hit_geo = (hit.tri >= 0) & alive

    radiance = state.radiance
    throughput = state.throughput

    # --- Light quads are invisible to the BVH: test them analytically.
    l_emit, l_pdf, _, l_hit = intersect_lights(scene, ro, rd, hit.t)
    w_light = jnp.where(state.use_mis & nee,
                        power_heuristic(state.bsdf_pdf, l_pdf), 1.0)
    radiance = radiance + jnp.where((l_hit & alive)[:, None],
                                    throughput * l_emit * w_light[:, None], 0.0)

    # --- Environment on geometry miss.
    if scene.has_probe:
        env_l = eval_env(scene, rd)
        w_env = jnp.where(state.use_mis, power_heuristic(state.bsdf_pdf, env_pdf(scene, rd)), 1.0)
        radiance = radiance + jnp.where(miss[:, None],
                                        throughput * env_l * w_env[:, None], 0.0)

    # --- Decode surfaces for geometry hits.
    surf = decode_surface(scene, ro, rd, hit, textures=scene.has_textures)
    wo = -rd

    # Emissive surfaces (no NEE on emissive tris -> full weight).
    radiance = radiance + jnp.where(hit_geo[:, None],
                                    throughput * surf.emission, 0.0)

    k_nee, k_env, k_lobe, k_u1, k_u2, k_ls, k_l1, k_l2 = jax.random.split(key, 8)
    R = ro.shape[0]

    # --- NEE: quad lights.
    if nee and scene.num_lights > 0:
        if light_uv is not None:
            u1_l, u2_l = light_uv[:, 0], light_uv[:, 1]
        else:
            u1_l = jax.random.uniform(k_l1, (R,))
            u2_l = jax.random.uniform(k_l2, (R,))
        wi_l, dist_l, emit_l, pdf_l = sample_light(
            scene, surf.pos,
            jax.random.uniform(k_ls, (R,)), u1_l, u2_l)
        f_l, pdf_b_l = bsdf_eval_pdf(surf, wo, wi_l)
        cos_i = jnp.maximum(jnp.sum(surf.n_shade * wi_l, axis=1), 0.0)
        contrib_mask = hit_geo & (pdf_l > 0) & (cos_i > 0) & (luminance(f_l) > 0)
        shadow_o = surf.pos + surf.n_geom * EPS_OFFSET
        # named_scope: lets the fused-frame trace split shadow traversal
        # out of the shading label (app/trace_parse.py).
        with jax.named_scope("shadow"):
            if bounce >= _shadow_sort_bounce() \
                    and scene.num_nodes > 16384:
                blocked = _occluded_sorted(scene, shadow_o, wi_l, dist_l,
                                           contrib_mask)
            else:
                blocked = occluded(scene, shadow_o, wi_l, dist_l,
                                   active=contrib_mask)
        w = power_heuristic(pdf_l, pdf_b_l)
        contrib = throughput * f_l * emit_l * (cos_i * w / jnp.maximum(pdf_l, 1e-12))[:, None]
        radiance = radiance + jnp.where((contrib_mask & ~blocked)[:, None], contrib, 0.0)

    # --- NEE: environment probe.
    if nee and scene.has_probe:
        ke1, ke2 = jax.random.split(k_env)
        wi_e, pdf_e = sample_env(scene, jax.random.uniform(ke1, (R,)),
                                 jax.random.uniform(ke2, (R,)))
        f_e, pdf_b_e = bsdf_eval_pdf(surf, wo, wi_e)
        cos_e = jnp.maximum(jnp.sum(surf.n_shade * wi_e, axis=1), 0.0)
        mask_e = hit_geo & (pdf_e > 0) & (cos_e > 0) & (luminance(f_e) > 0)
        shadow_o = surf.pos + surf.n_geom * EPS_OFFSET
        far = scene_exit_t(scene, shadow_o, wi_e)
        with jax.named_scope("shadow"):
            if bounce >= _shadow_sort_bounce() \
                    and scene.num_nodes > 16384:
                blocked_e = _occluded_sorted(scene, shadow_o, wi_e, far,
                                             mask_e)
            else:
                blocked_e = occluded(scene, shadow_o, wi_e, far,
                                     active=mask_e)
        env_l = eval_env(scene, wi_e)
        w_e = power_heuristic(pdf_e, pdf_b_e)
        contrib_e = throughput * f_e * env_l * (cos_e * w_e / jnp.maximum(pdf_e, 1e-12))[:, None]
        radiance = radiance + jnp.where((mask_e & ~blocked_e)[:, None], contrib_e, 0.0)

    # --- Sample the BSDF for the continuation ray.
    u_lobe = (lobe_u if lobe_u is not None
              else jax.random.uniform(k_lobe, (R,)))
    u1 = bsdf_uv[:, 0] if bsdf_uv is not None else jax.random.uniform(
        k_u1, (R,))
    u2 = bsdf_uv[:, 1] if bsdf_uv is not None else jax.random.uniform(
        k_u2, (R,))
    wi, f, pdf = sample_bsdf(surf, wo, u_lobe, u1, u2)
    cos_n = jnp.sum(surf.n_shade * wi, axis=1)
    ok = hit_geo & (pdf > 1e-12) & (cos_n > 0) & (jnp.sum(surf.n_geom * wi, axis=1) > 0)
    new_throughput = throughput * f * (jnp.maximum(cos_n, 0.0) / jnp.maximum(pdf, 1e-12))[:, None]

    if last:
        # --- Final gather: the continuation ray is never intersected
        # against geometry, so settle its direct-light share here with one
        # any-hit query (per-ray tmax: light distance, or scene-exit for
        # env). MIS weights mirror the arrival-time handling above.
        gro = surf.pos + surf.n_geom * EPS_OFFSET
        g_emit, g_pdf, g_t, g_lhit = intersect_lights(
            scene, gro, wi, jnp.full(R, T_FAR))
        probe_term = bool(scene.has_probe)
        far = scene_exit_t(scene, gro, wi)
        occl_t = jnp.where(g_lhit, g_t, far) if probe_term else g_t
        occl_active = ok & (g_lhit | probe_term)
        with jax.named_scope("shadow"):
            if bounce >= _shadow_sort_bounce() \
                    and scene.num_nodes > 16384:
                g_blocked = _occluded_sorted(scene, gro, wi, occl_t,
                                             occl_active)
            else:
                g_blocked = occluded(scene, gro, wi, occl_t,
                                     active=occl_active)

        w_gl = jnp.where(jnp.bool_(nee), power_heuristic(pdf, g_pdf), 1.0)
        add_l = (ok & g_lhit & ~g_blocked)
        radiance = radiance + jnp.where(
            add_l[:, None], new_throughput * g_emit * w_gl[:, None], 0.0)
        if probe_term:
            g_env = eval_env(scene, wi)
            w_ge = jnp.where(jnp.bool_(nee),
                             power_heuristic(pdf, env_pdf(scene, wi)), 1.0)
            add_e = ok & ~g_blocked
            radiance = radiance + jnp.where(
                add_e[:, None], new_throughput * g_env * w_ge[:, None], 0.0)
        dead = jnp.zeros_like(alive)
        return BounceState(ro=ro, rd=rd, throughput=throughput,
                           radiance=radiance, alive=dead,
                           bsdf_pdf=state.bsdf_pdf,
                           use_mis=state.use_mis), surf

    new_state = BounceState(
        ro=jnp.where(ok[:, None], surf.pos + surf.n_geom * EPS_OFFSET, ro),
        rd=jnp.where(ok[:, None], wi, rd),
        throughput=jnp.where(ok[:, None], new_throughput, throughput),
        radiance=radiance,
        alive=ok,
        bsdf_pdf=jnp.where(ok, pdf, state.bsdf_pdf),
        use_mis=jnp.where(ok, jnp.bool_(nee), state.use_mis),
    )
    return new_state, surf
