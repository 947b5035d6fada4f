"""Renderer: owns frame state and the jitted frame pipeline.

API mirrors the reference ``Renderer`` (`crates/lib/src/renderer.rs:169-859`):
``new/resize/raytrace/blit/read_pixels/set_resources/upload_noise_texture/
use_noise_texture/set_blit_mode/reset_accumulation/get_size`` — with wgpu
bind groups/encoders replaced by one jitted pure function over pytrees:

    render_frame(scene, state, camera, flags) -> new state

State (accumulation targets, frame count, RNG key, previous matrices,
G-buffer) is a frozen pytree living on device; host code only flips small
flags and feeds camera transforms, keeping host<->device traffic out of the
hot loop (the reference re-uploads uniforms per bounce, renderer.rs:487-490;
here seeds/bounce ids are traced constants folded into the compiled frame).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import BlitMode, RenderConfig, clamp_size, downsampled_size
from ..ops.tonemap import to_display
from ..scene.buffers import SceneBuffers
from .camera import Camera
from .integrator import accumulate, trace_paths


@struct.dataclass
class RenderState:
    """Per-session device state (render targets + uniforms analog)."""

    accum: jnp.ndarray  # (H, W, 3) float32 running average (RenderTargets)
    frame_count: jnp.ndarray  # () int32 (PerDrawUniforms.frame_count)
    key: jnp.ndarray  # PRNG key (PerDrawUniforms.seed analog)
    prev_world_to_screen: jnp.ndarray  # (4, 4) (renderer.rs:542-546)
    # First-bounce G-buffer of the last frame (PrimaryRayPass outputs).
    gb_normal: jnp.ndarray  # (H, W, 3)
    gb_depth: jnp.ndarray  # (H, W)
    gb_mesh: jnp.ndarray  # (H, W) int32
    gb_albedo: jnp.ndarray  # (H, W, 3)
    motion: jnp.ndarray  # (H, W, 2) uv motion vectors
    # Blue-noise texture (renderer.rs:620-664); (Hn, Wn, 2) float32 in
    # [0,1). Consumed for first-bounce AA jitter with a per-frame R2
    # Cranley-Patterson rotation when use_noise is on.
    noise_tex: jnp.ndarray
    # A-SVGF ping-pong state (denoise/asvgf.py; reference asvgf.rs:9-152).
    asvgf_illum: jnp.ndarray  # (H, W, 3) integrated illumination
    asvgf_moments: jnp.ndarray  # (H, W, 2)
    asvgf_history: jnp.ndarray  # (H, W)
    denoised: jnp.ndarray  # (H, W, 3) last denoiser output
    temporal_rgb: jnp.ndarray  # (H, W, 3) temporal-pass debug output
    # (4,) completion probe derived from the frame's outputs: fencing a
    # frame costs a 16-byte D2H instead of a full-image transfer or an
    # extra status round trip (the tunneled backend charges ~25-55 ms per
    # synchronous round trip — see bench.py header).
    probe: jnp.ndarray = None


def _init_state(width: int, height: int, seed: int = 0) -> RenderState:
    h, w = height, width
    return RenderState(
        accum=jnp.zeros((h, w, 3), jnp.float32),
        frame_count=jnp.int32(1),
        key=jax.random.PRNGKey(seed),
        prev_world_to_screen=jnp.eye(4, dtype=jnp.float32),
        gb_normal=jnp.zeros((h, w, 3), jnp.float32),
        gb_depth=jnp.zeros((h, w), jnp.float32),
        gb_mesh=jnp.full((h, w), -1, jnp.int32),
        gb_albedo=jnp.ones((h, w, 3), jnp.float32),
        motion=jnp.zeros((h, w, 2), jnp.float32),
        noise_tex=jnp.full((64, 64, 2), 0.5, jnp.float32),
        asvgf_illum=jnp.zeros((h, w, 3), jnp.float32),
        asvgf_moments=jnp.zeros((h, w, 2), jnp.float32),
        asvgf_history=jnp.zeros((h, w), jnp.float32),
        denoised=jnp.zeros((h, w, 3), jnp.float32),
        temporal_rgb=jnp.zeros((h, w, 3), jnp.float32),
        probe=jnp.zeros(4, jnp.float32),
    )


def _project_uv(world_to_screen: jnp.ndarray, pos: jnp.ndarray):
    """World (R,3) -> screen uv in [0,1] (y down) + clip w."""
    p = jnp.concatenate([pos, jnp.ones_like(pos[:, :1])], axis=1)
    clip = p @ world_to_screen.T
    w = clip[:, 3]
    ndc = clip[:, :2] / jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)[:, None]
    uv = jnp.stack([(ndc[:, 0] + 1.0) * 0.5, (1.0 - ndc[:, 1]) * 0.5], axis=1)
    return uv, w


def blue_noise_uv(noise_tex: jnp.ndarray, frame_count: jnp.ndarray,
                  width: int, height: int, dim: int = 0,
                  row_offset=0, rows: int | None = None) -> jnp.ndarray:
    """Per-pixel blue-noise 2-vector with an R2 Cranley-Patterson rotation.

    ``dim`` selects a decorrelated dimension pair (0 = AA jitter, then
    3 pairs per bounce: light sampling, BSDF sampling, lobe selection) by
    offsetting the toroidal rotation — the reference gates ALL shading
    noise on one texture the same way
    (RadianceParameters.use_noise_texture, renderer.rs:666-673).

    ``row_offset``/``rows`` generate the plane for one horizontal slab
    (multi-chip tile sharding, parallel/tiles.py).
    """
    if rows is None:
        rows = height
    hn, wn = noise_tex.shape[:2]
    yy, xx = jnp.meshgrid((row_offset + jnp.arange(rows)) % hn,
                          jnp.arange(width) % wn, indexing="ij")
    base = noise_tex[yy.reshape(-1), xx.reshape(-1)]  # (R, 2)
    g = jnp.asarray([0.7548776662, 0.5698402910])  # R2 sequence
    rot = (frame_count.astype(jnp.float32) * g + dim * 0.38196601) % 1.0
    return (base + rot) % 1.0


@functools.partial(jax.jit, static_argnames=("width", "height", "bounces",
                                             "nee", "vfov", "mode",
                                             "atrous_iterations",
                                             "use_noise", "spp"))
def render_frame(scene: SceneBuffers, state: RenderState,
                 cam_to_world: jnp.ndarray, world_to_screen: jnp.ndarray,
                 accumulate_flag: jnp.ndarray, *, width: int, height: int,
                 bounces: int, nee: bool, vfov: float,
                 mode: str = "pathtrace",
                 atrous_iterations: int = 4,
                 use_noise: bool = False, spp: int = 1) -> RenderState:
    """One progressive frame (raytrace() analog, renderer.rs:392-549).

    ``mode``: 'pathtrace' runs progressive accumulation; 'denoised' runs the
    full A-SVGF chain; 'temporal' only the temporal pass; 'none' neither
    (debug blit modes) — mirroring the match at renderer.rs:512-540.
    """
    key, k_frame = jax.random.split(state.key)
    jitter = nee_uv = None
    if use_noise:
        # Blue-noise AA jitter + first-bounce light-sampling pair, each with
        # a per-frame R2 Cranley-Patterson rotation
        # (RadianceParameters.use_noise_texture analog, renderer.rs:666-673).
        jitter = blue_noise_uv(state.noise_tex, state.frame_count,
                               width, height, dim=0)
        nee_uv = blue_noise_uv(state.noise_tex, state.frame_count,
                               width, height, dim=1)
    sample, gb = trace_paths(
        scene, cam_to_world, width, height, k_frame,
        bounces=bounces, vfov=vfov, nee=nee, jitter=jitter, nee_uv=nee_uv,
        noise_tex=state.noise_tex if use_noise else None,
        frame_count=state.frame_count if use_noise else None, spp=spp)
    img = sample.reshape(height, width, 3)

    # Motion vectors: previous-frame screen uv minus current pixel uv
    # (PrimaryRayPass writes these from prev_model_to_screen,
    # renderer.rs:472-479).
    uv_prev, w_prev = _project_uv(state.prev_world_to_screen, gb.world_pos)
    yy, xx = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    uv_curr = jnp.stack([(xx.reshape(-1) + 0.5) / width,
                         (yy.reshape(-1) + 0.5) / height], axis=1)
    valid = (gb.mesh_id >= 0) & (w_prev > 0)
    motion = (jnp.where(valid[:, None], uv_prev - uv_curr, 0.0)
              .reshape(height, width, 2))

    curr_normal = gb.normal.reshape(height, width, 3)
    curr_depth = gb.depth.reshape(height, width)
    curr_mesh = gb.mesh_id.reshape(height, width)
    curr_albedo = gb.albedo.reshape(height, width, 3)

    new = dict(
        key=key,
        prev_world_to_screen=world_to_screen,
        gb_normal=curr_normal,
        gb_depth=curr_depth,
        gb_mesh=curr_mesh,
        gb_albedo=curr_albedo,
        motion=motion,
    )

    if mode == "pathtrace":
        new["accum"] = accumulate(state.accum, img, state.frame_count)
        new["frame_count"] = jnp.where(accumulate_flag,
                                       state.frame_count + 1, jnp.int32(1))
    elif mode in ("denoised", "temporal"):
        from ..denoise.asvgf import denoise, demodulate, modulate, temporal_reproject

        if mode == "denoised":
            with jax.named_scope("asvgf"):
                out, t = denoise(img, curr_albedo, motion,
                                 curr_normal, curr_depth, curr_mesh,
                                 state.gb_normal, state.gb_depth,
                                 state.gb_mesh,
                                 state.asvgf_illum, state.asvgf_moments,
                                 state.asvgf_history,
                                 iterations=atrous_iterations)
            new["denoised"] = out
        else:
            with jax.named_scope("asvgf"):
                t = temporal_reproject(
                    demodulate(img, curr_albedo), motion,
                    curr_normal, curr_depth, curr_mesh,
                    state.gb_normal, state.gb_depth, state.gb_mesh,
                    state.asvgf_illum, state.asvgf_moments,
                    state.asvgf_history)
        new["asvgf_illum"] = t.illum
        new["asvgf_moments"] = t.moments
        new["asvgf_history"] = t.history
        new["temporal_rgb"] = modulate(t.illum, curr_albedo)

    disp = new.get("denoised",
                   new.get("temporal_rgb", new.get("accum", state.accum)))
    new["probe"] = jnp.stack([
        img[0, 0, 0], img[height // 2, width // 2, 1],
        disp[0, 0, 2], disp[height // 2, width // 2, 0]])
    return state.replace(**new)


@functools.partial(jax.jit, static_argnames=("out_hw", "tonemap"))
def _blit_rgb(img: jnp.ndarray, out_hw, tonemap: str) -> jnp.ndarray:
    """Radiance -> display uint8, bilinearly upscaled to ``out_hw`` when set
    (the reference blit shader samples the half-res HDR target with a
    linear sampler BEFORE tonemapping, renderer.rs:551-607)."""
    if out_hw is not None:
        img = jax.image.resize(img, (out_hw[0], out_hw[1], img.shape[2]),
                               method="bilinear")
    return to_display(img, tonemap)


# Stage-granular jits for Renderer.measure_passes (module-level so repeated
# measurements reuse the compile cache).
@functools.partial(jax.jit, static_argnames=("width", "height", "vfov"))
def _stage_raygen(cam_to_world, jitter, *, width, height, vfov):
    from ..ops.raygen import generate_rays

    return generate_rays(cam_to_world, width, height, vfov, jitter)


@jax.jit
def _stage_intersect(scene, ro, rd, alive):
    from ..ops.intersect import intersect_any

    return intersect_any(scene, ro, rd, active=alive)


@functools.partial(jax.jit, static_argnames=("nee", "last"))
def _stage_shade(scene, state, hit, key, *, nee, last):
    from ..ops.shade import shade_step

    return shade_step(scene, state, hit, key, nee=nee, last=last)


@functools.partial(jax.jit, static_argnames=("iterations",))
def _stage_asvgf(img, albedo, motion, n, d, m, pn, pd, pm, illum, moments,
                 history, *, iterations):
    from ..denoise.asvgf import denoise

    return denoise(img, albedo, motion, n, d, m, pn, pd, pm, illum, moments,
                   history, iterations=iterations)


class Renderer:
    """Stateful façade over the jitted pipeline (Renderer analog)."""

    def __init__(self, size: tuple, config: Optional[RenderConfig] = None,
                 seed: int = 0, mesh=None):
        """``mesh``: optional jax.sharding.Mesh with ('tiles','spp') axes —
        frames then trace tile-parallel across devices
        (parallel/tiles.py::render_frame_sharded)."""
        self.config = config or RenderConfig()
        self.downsample_factor = self.config.downsample_factor
        self._seed = seed
        self.mesh = mesh
        self.accumulate = False
        self.mode = BlitMode.PATHTRACE
        self.use_noise = False
        self.noise_texture: Optional[np.ndarray] = None
        self.scene: Optional[SceneBuffers] = None
        self.queries = None  # timing hook, installed by app layer
        self.last_reload_error: Optional[str] = None
        self._aot_dir = None  # enable_aot_cache() turns the AOT path on
        self._aot = None
        self._aot_loaded = False
        self._set_size(size)

    # -- sizing ------------------------------------------------------------
    def _set_size(self, size: tuple) -> None:
        w, h = clamp_size(size[0], size[1], self.config)
        # The DISPLAY surface keeps the window resolution; the path tracer
        # renders at downsample_factor and blit() upscales back
        # (renderer.rs:225,551-607: render at 0.5x, blit to full surface).
        self.window_size = (max(w, 1), max(h, 1))
        w, h = downsampled_size(w, h, self.downsample_factor)
        if self.mesh is not None:
            # Row slabs must divide across the 'tiles' axis.
            tiles = self.mesh.shape["tiles"]
            h = max((h // tiles) * tiles, tiles)
        self.size = (max(w, 1), max(h, 1))
        self.state = _init_state(self.size[0], self.size[1], self._seed)
        if self.noise_texture is not None:
            self.upload_noise_texture(self.noise_texture)

    def resize(self, size: tuple) -> None:
        """Realloc frame state (renderer.rs:326-358)."""
        self._set_size(size)

    def get_size(self) -> tuple:
        return self.size

    # -- resources ---------------------------------------------------------
    def set_resources(self, scene: SceneBuffers) -> None:
        """Bind a scene; resets accumulation (renderer.rs:687-725)."""
        if self.mesh is not None:
            from ..parallel.tiles import replicate_scene

            scene = replicate_scene(scene, self.mesh)
        self.scene = scene
        self.state = self.state.replace(frame_count=jnp.int32(1))

    def upload_noise_texture(self, data: np.ndarray) -> None:
        """Bind a blue-noise texture (renderer.rs:620-664)."""
        self.noise_texture = np.asarray(data, np.uint8)
        tex = (self.noise_texture[..., :2].astype(np.float32) + 0.5) / 256.0
        self.state = self.state.replace(noise_tex=jnp.asarray(tex))

    def use_noise_texture(self, flag: bool) -> None:
        self.use_noise = bool(flag)

    # -- AOT executable cache ----------------------------------------------
    def enable_aot_cache(self, cache_dir: str | None = None) -> None:
        """Persist/reuse the compiled frame executable across processes
        (render/aot.py): a fresh process pays ~0.5 s deserialize instead
        of the 70-94 s remote-compile stall (VERDICT r4 #4; measured in
        artifacts/r5_device3/aot_probe.log). Entries auto-invalidate by
        fingerprint (shapes, statics, backend); any load failure falls
        back to the jit path."""
        self._aot_dir = cache_dir or True  # True = module default dir
        self._aot = None
        self._aot_loaded = False

    def set_blit_mode(self, mode: BlitMode) -> None:
        self.mode = mode

    def reset_accumulation(self) -> None:
        """frame_count = 1 (renderer.rs:609-618). Matches the reference: it
        only restarts the running average; the ``accumulate`` toggle is left
        alone (the app layer owns that flag, app.rs:308-310)."""
        self.state = self.state.replace(frame_count=jnp.int32(1))

    # -- frame -------------------------------------------------------------
    def raytrace(self, view_transform: np.ndarray) -> None:
        """Render one progressive frame with the given camera-to-world."""
        if self.scene is None:
            return  # no scene bound: bail like renderer.rs:404-407
        cam = Camera(np.asarray(view_transform, np.float32), self.size,
                     np.deg2rad(self.config.vfov_deg))
        bounces = (self.config.bounces_static if self.accumulate
                   else self.config.bounces_moving)
        mode = {
            BlitMode.PATHTRACE: "pathtrace",
            BlitMode.DENOISED_PATHTRACE: "denoised",
            BlitMode.TEMPORAL: "temporal",
            BlitMode.GBUFFER: "none",
            BlitMode.MOTION_VECTOR: "none",
        }[self.mode]
        if self.mesh is not None:
            from ..parallel.tiles import render_frame_sharded

            self.state = render_frame_sharded(
                self.scene, self.state,
                jnp.asarray(cam.transform),
                jnp.asarray(cam.world_to_screen(self.config.near,
                                                self.config.far)),
                jnp.bool_(self.accumulate),
                mesh=self.mesh, width=self.size[0], height=self.size[1],
                bounces=bounces, nee=self.config.nee,
                vfov=float(np.deg2rad(self.config.vfov_deg)),
                mode=mode, atrous_iterations=self.config.atrous_iterations,
                use_noise=self.use_noise and self.noise_texture is not None,
            )
            return
        args = (self.scene, self.state, jnp.asarray(cam.transform),
                jnp.asarray(cam.world_to_screen(self.config.near,
                                                self.config.far)),
                jnp.bool_(self.accumulate))
        statics = dict(
            width=self.size[0], height=self.size[1],
            bounces=bounces, nee=self.config.nee,
            vfov=float(np.deg2rad(self.config.vfov_deg)),
            mode=mode, atrous_iterations=self.config.atrous_iterations,
            use_noise=self.use_noise and self.noise_texture is not None,
            spp=self.config.samples_per_frame,
        )
        if self._aot_dir is not None:
            if self._raytrace_aot(args, statics):
                return
        self.state = render_frame(*args, **statics)

    def _raytrace_aot(self, args, statics) -> bool:
        """Frame via the AOT executable cache (enable_aot_cache). Returns
        False on any mismatch/failure — the caller falls back to jit."""
        from . import aot

        if len(jax.devices()) != 1:
            # Serialized executables pin a device assignment; only the
            # single-chip interactive path is supported (multi-device
            # hosts fall back to jit — observed: a deserialized
            # executable on an 8-device host demands 8-shard args).
            return False
        cache_dir = None if self._aot_dir is True else self._aot_dir
        fp = aot.fingerprint(args[0], args[1], tuple(sorted(statics.items())))
        if self._aot is None or self._aot[0] != fp:
            compiled = aot.load(fp, cache_dir)
            self._aot_loaded = compiled is not None
            if compiled is None:
                try:
                    compiled = render_frame.lower(*args, **statics).compile()
                    aot.save(compiled, fp, cache_dir)
                except Exception:
                    return False
            self._aot = (fp, compiled)
        try:
            self.state = self._aot[1](*args)
            return True
        except Exception:
            # Deserialized executable rejected the call (aval/weak-type
            # mismatch, stale device): drop it and let jit handle the frame.
            self._aot = None
            self._aot_loaded = False
            return False

    # -- display -----------------------------------------------------------
    def blit(self, display_size: bool = True) -> np.ndarray:
        """(H, W, 3) uint8 display image for the current mode at the WINDOW
        resolution (renderer.rs:551-607: the blit pass samples the 0.5x
        internal target with a linear sampler onto the full-size surface).
        ``display_size=False`` returns the internal-resolution image."""
        s = self.state
        if self.mode == BlitMode.PATHTRACE:
            img = _blit_rgb(s.accum, self._display_hw(display_size),
                            self.config.tonemap)
        elif self.mode == BlitMode.DENOISED_PATHTRACE:
            img = _blit_rgb(s.denoised, self._display_hw(display_size),
                            self.config.tonemap)
        elif self.mode == BlitMode.TEMPORAL:
            img = _blit_rgb(s.temporal_rgb, self._display_hw(display_size),
                            self.config.tonemap)
        elif self.mode == BlitMode.GBUFFER:
            vis = np.asarray(s.gb_normal) * 0.5 + 0.5
            vis[np.asarray(s.gb_mesh) < 0] = 0.0
            img = self._upscale_debug(vis, display_size)
        elif self.mode == BlitMode.MOTION_VECTOR:
            mv = np.asarray(s.motion)
            vis = np.zeros(mv.shape[:2] + (3,), np.float32)
            vis[..., :2] = np.clip(np.abs(mv) * 20.0, 0, 1)
            img = self._upscale_debug(vis, display_size)
        else:
            raise ValueError(f"unknown blit mode {self.mode}")
        return np.asarray(img)

    def _display_hw(self, display_size: bool):
        if not display_size:
            return None
        hw = (self.window_size[1], self.window_size[0])
        return None if hw == (self.size[1], self.size[0]) else hw

    def _upscale_debug(self, vis: np.ndarray, display_size: bool):
        hw = self._display_hw(display_size)
        if hw is not None:
            # Debug views upscale nearest: they visualize raw buffer texels
            # (BlitTexturePass analog), not filtered radiance.
            yy = np.minimum((np.arange(hw[0]) * vis.shape[0]) // hw[0],
                            vis.shape[0] - 1)
            xx = np.minimum((np.arange(hw[1]) * vis.shape[1]) // hw[1],
                            vis.shape[1] - 1)
            vis = vis[yy[:, None], xx[None, :]]
        return (vis * 255).astype(np.uint8)

    def read_pixels(self) -> bytes:
        """RGBA8 bytes of the displayed image at window resolution
        (renderer.rs:727-811: readback blits to a window-size Rgba8 target)."""
        rgb = self.blit()
        rgba = np.concatenate(
            [rgb, np.full(rgb.shape[:2] + (1,), 255, np.uint8)], axis=2)
        return rgba.tobytes()

    def measure_passes(self, view_transform: np.ndarray,
                       queries=None, method: str = "auto") -> dict:
        """Per-pass kernel timings, labeled like the reference performance
        window ("ray generation", "primary intersection", "shading 0",
        "intersection N"/"shading N", "asvgf" —
        `crates/lib/src/renderer.rs:444-448,457,515`,
        `gui/windows/performance_info.rs:23-47`).

        ``method``:
          - "trace" — MEASURED per-pass device times from one fused-frame
            ``jax.profiler`` trace: the integrator's named_scope tokens
            attribute every device op of the frame the user actually runs
            (app/trace_parse.py). The GPU-timestamp analog.
          - "replay" — dispatch the same kernels one stage at a time with a
            fence after each; raw unfused stage times overstate the fused
            frame (lost fusion + a dispatch fence per stage), so stages are
            RESCALED by fused/unfused_total to sum to the fused frame.
            Per-pass *shares* remain estimates. Off-device fallback.
          - "auto" — try "trace", fall back to "replay".

        The returned dict carries the stages plus "frame (fused)", and for
        replay "unfused total" (the rescaling is then flagged to the GUI).
        """
        import time as _time

        from ..ops.shade import BounceState
        from .integrator import _tiles_ok, to_tile_order

        if self.scene is None:
            return {}
        q = queries if queries is not None else self.queries
        cam = Camera(np.asarray(view_transform, np.float32), self.size,
                     np.deg2rad(self.config.vfov_deg))
        w, h = self.size
        bounces = (self.config.bounces_static if self.accumulate
                   else self.config.bounces_moving)
        key = self.state.key
        cam_m = jnp.asarray(cam.transform)

        mode = {BlitMode.PATHTRACE: "pathtrace",
                BlitMode.DENOISED_PATHTRACE: "denoised",
                BlitMode.TEMPORAL: "temporal",
                BlitMode.GBUFFER: "none",
                BlitMode.MOTION_VECTOR: "none"}[self.mode]

        _calls = [0]

        def fused_frame():
            # Fresh RNG per call: the tunneled backend dedupes repeat
            # executions with identical inputs, which turns repeat timings
            # (and the profiler trace) into cached no-ops (bench.py
            # header; observed in artifacts/r5_device3/trace_passes.log).
            _calls[0] += 1
            st = self.state.replace(key=jax.random.fold_in(self.state.key,
                                                           _calls[0]))
            return render_frame(
                self.scene, st, cam_m,
                jnp.asarray(cam.world_to_screen(self.config.near,
                                                self.config.far)),
                jnp.bool_(self.accumulate),
                width=w, height=h, bounces=bounces, nee=self.config.nee,
                vfov=float(np.deg2rad(self.config.vfov_deg)), mode=mode,
                atrous_iterations=self.config.atrous_iterations,
                use_noise=self.use_noise and self.noise_texture is not None,
                spp=self.config.samples_per_frame)

        if method in ("auto", "trace"):
            from ..app.trace_parse import (frame_scope_labels,
                                           measure_fused_passes)

            jax.block_until_ready(fused_frame())  # warm (compile outside)
            t0 = _time.perf_counter()
            jax.block_until_ready(fused_frame())
            fused = (_time.perf_counter() - t0) * 1e3
            labels = frame_scope_labels(
                bounces, denoised=mode in ("denoised", "temporal"))
            measured = measure_fused_passes(fused_frame, labels)
            matched = (sum(measured.values()) - measured.get("other", 0.0)
                       if measured else 0.0)
            total = sum(measured.values()) if measured else 0.0
            # Trust the trace only when the scope tokens actually matched
            # the bulk of device time (a plane with stripped metadata would
            # dump everything in "other").
            if measured is not None and matched > 0.3 * total > 0:
                measured["frame (fused)"] = fused
                measured["method"] = "trace"
                if q is not None:
                    for label, ms in measured.items():
                        if isinstance(ms, float):
                            q.record(label, ms)
                return measured
            if method == "trace":
                return {}
        out = {}

        def timed(label, fn, *args, **kw):
            t0 = _time.perf_counter()
            r = jax.block_until_ready(fn(*args, **kw))
            out[label] = (_time.perf_counter() - t0) * 1e3
            return r

        k_jit, k_bounce = jax.random.split(key)
        jitter = jax.random.uniform(k_jit, (w * h, 2))
        ro, rd = timed("ray generation", _stage_raygen, cam_m, jitter,
                       width=w, height=h,
                       vfov=float(np.deg2rad(self.config.vfov_deg)))
        if _tiles_ok(w, h):
            ro, rd = to_tile_order(ro, w, h), to_tile_order(rd, w, h)
        R = w * h
        state = BounceState(
            ro=ro, rd=rd, throughput=jnp.ones((R, 3)),
            radiance=jnp.zeros((R, 3)), alive=jnp.ones(R, jnp.bool_),
            bsdf_pdf=jnp.zeros(R), use_mis=jnp.zeros(R, jnp.bool_))
        for bounce in range(bounces):
            label = ("primary intersection" if bounce == 0
                     else f"intersection {bounce}")
            hit = timed(label, _stage_intersect, self.scene,
                        state.ro, state.rd, state.alive)
            k_bounce, k_step = jax.random.split(k_bounce)
            state, _ = timed(f"shading {bounce}", _stage_shade, self.scene,
                             state, hit, k_step, nee=self.config.nee,
                             last=(bounce == bounces - 1))
        if self.mode == BlitMode.DENOISED_PATHTRACE:
            s = self.state
            timed("asvgf", _stage_asvgf, s.accum, s.gb_albedo, s.motion,
                  s.gb_normal, s.gb_depth, s.gb_mesh, s.gb_normal,
                  s.gb_depth, s.gb_mesh, s.asvgf_illum, s.asvgf_moments,
                  s.asvgf_history,
                  iterations=self.config.atrous_iterations)

        # Reconcile against the fused frame (VERDICT r3: the GUI must not
        # report a pipeline the user isn't running). Time render_frame
        # without committing its state; two calls, min, so a cold compile
        # on the first doesn't pollute the number.
        unfused_total = sum(out.values())
        fused = float("inf")
        for _ in range(2):
            t0 = _time.perf_counter()
            jax.block_until_ready(fused_frame())
            fused = min(fused, (_time.perf_counter() - t0) * 1e3)
        scale = fused / unfused_total if unfused_total > 0 else 1.0
        out = {label: ms * scale for label, ms in out.items()}
        out["frame (fused)"] = fused
        out["unfused total"] = unfused_total
        out["method"] = "replay"
        if q is not None:
            for label, ms in out.items():
                if isinstance(ms, float):
                    q.record(label, ms)
        return out

    # Kernel modules re-read on reload ("shader sources" analog).
    _RELOADABLE = (
        "loupiote_tpu.ops.raygen", "loupiote_tpu.ops.intersect",
        "loupiote_tpu.ops.pallas_intersect", "loupiote_tpu.ops.pallas_wide",
        "loupiote_tpu.ops.shade",
        "loupiote_tpu.ops.sampling", "loupiote_tpu.ops.env",
        "loupiote_tpu.ops.texture", "loupiote_tpu.ops.sort",
        "loupiote_tpu.ops.tonemap", "loupiote_tpu.ops.lightmap",
        "loupiote_tpu.denoise.asvgf",
    )
    # Modules that bind kernel functions via top-level from-imports: they
    # must be reloaded AFTER the kernels or the running pipeline keeps the
    # OLD function objects (round-3 advisor finding). Order matters
    # (integrator before its importers).
    _REBINDERS = (
        "loupiote_tpu.render.integrator",
        "loupiote_tpu.parallel.tiles",
    )

    def reload_shaders(self) -> None:
        """Hot-reload: re-import the kernel modules (the 'shader sources')
        and drop compiled caches so the next frame traces the new code.

        Keep-old-on-error (renderer.rs:360-390, asvgf.rs:294-305): the
        reloaded kernels are validated by abstract-evaluating one frame; on
        any import/trace error the previous module state is restored, the
        error is kept in ``last_reload_error``, and the session keeps
        rendering with the old pipeline. (Validation covers trace-time
        errors — the analog of WGSL compile errors; a kernel that only
        fails on device at run time is caught by the app layer's per-frame
        error handling instead.)"""
        import importlib
        import sys

        snapshots = {}
        # This module's own top-level from-imports, re-pointed at the
        # reloaded modules so render_frame/accumulate trace the NEW code.
        g = globals()
        rebound = {n: g[n] for n in ("trace_paths", "accumulate",
                                     "to_display")}
        try:
            for name in self._RELOADABLE + self._REBINDERS:
                mod = sys.modules.get(name)
                if mod is not None:
                    snapshots[name] = dict(mod.__dict__)
                    importlib.reload(mod)
            integ = sys.modules.get("loupiote_tpu.render.integrator")
            if integ is not None:
                g["trace_paths"] = integ.trace_paths
                g["accumulate"] = integ.accumulate
            tmod = sys.modules.get("loupiote_tpu.ops.tonemap")
            if tmod is not None:
                g["to_display"] = tmod.to_display
            if self.scene is not None:
                cam = Camera(np.eye(4, dtype=np.float32), self.size,
                             np.deg2rad(self.config.vfov_deg))
                jax.eval_shape(
                    functools.partial(
                        render_frame, width=self.size[0],
                        height=self.size[1], bounces=1,
                        nee=self.config.nee,
                        vfov=float(np.deg2rad(self.config.vfov_deg)),
                        mode="pathtrace"),
                    self.scene, self.state, jnp.asarray(cam.transform),
                    jnp.eye(4, dtype=jnp.float32), jnp.bool_(True))
        except Exception as e:  # keep the old pipeline
            for name, d in snapshots.items():
                mod = sys.modules.get(name)
                if mod is not None:
                    mod.__dict__.clear()
                    mod.__dict__.update(d)
            g.update(rebound)
            self.last_reload_error = f"{type(e).__name__}: {e}"
            return
        self.last_reload_error = None
        render_frame.clear_cache()
        for stage in (_stage_raygen, _stage_intersect, _stage_shade,
                      _stage_asvgf):
            stage.clear_cache()
