"""Configuration: promotes the reference's scattered literals to one place.

Reference sources: ``Settings`` (`crates/standalone/src/settings.rs:3-17`),
``BlitMode`` (`crates/lib/src/renderer.rs:160-167`), bounce/resolution
constants (`renderer.rs:203,225,398-399`), SSBO budget clamp
(`crates/standalone/src/app.rs:78-92`, `src/lib.rs:193-198`).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass


class BlitMode(enum.Enum):
    """Display mode switch (renderer.rs:160-167; sic 'Pahtrace' fixed)."""

    PATHTRACE = "pathtrace"
    DENOISED_PATHTRACE = "denoised_pathtrace"
    TEMPORAL = "temporal"
    GBUFFER = "gbuffer"
    MOTION_VECTOR = "motion_vector"


@dataclass(frozen=True)
class RenderConfig:
    """Static (compile-time) render parameters."""

    downsample_factor: float = 0.5  # renderer.rs:225: render at half window res
    bounces_static: int = 3  # renderer.rs:398
    bounces_moving: int = 3  # renderer.rs:399
    vfov_deg: float = 45.0
    near: float = 0.01  # renderer.rs:544
    far: float = 100.0
    nee: bool = True
    tonemap: str = "aces"
    atlas_size: int = 2048
    # Resolution budget analog of the 256 MiB SSBO clamp (app.rs:78-92):
    # pixels are clamped so per-pixel state stays within this many bytes.
    max_buffer_bytes: int = 256 * 1024 * 1024
    # Per-pixel state: ray (32B) + intersection (16B) conservative analog.
    bytes_per_pixel: int = 48
    # A-SVGF (à-trous iteration count must stay even: asvgf.rs:286-287).
    atrous_iterations: int = 4
    denoise: bool = True
    # Samples per pixel traced per frame in ONE batched wave (the frame
    # still accumulates/denoises as one sample = their mean). >1 packs
    # tighter secondary sub-packets and amortizes per-wave fixed costs
    # (experiments/spp_sim.py: 0.900x union steps/ray at 4).
    samples_per_frame: int = 1

    @property
    def max_pixels(self) -> int:
        return self.max_buffer_bytes // self.bytes_per_pixel


@dataclass
class Settings:
    """Runtime-mutable settings (settings.rs:3-17; app init sets
    DenoisedPathrace, app.rs:63)."""

    accumulate: bool = False
    use_blue_noise: bool = False
    blit_mode: BlitMode = BlitMode.PATHTRACE


def clamp_size(width: int, height: int, cfg: RenderConfig) -> tuple:
    """Clamp pixel count to the buffer budget (app.rs:78-92 semantics)."""
    target = width * height
    if target <= cfg.max_pixels:
        return width, height
    ratio = cfg.max_pixels / target
    return max(int(width * ratio), 1), max(int(height * ratio), 1)


def downsampled_size(width: int, height: int, factor: float) -> tuple:
    """renderer.rs:18-22 semantics (truncating cast)."""
    return int(width * factor), int(height * factor)
