"""Device wrapper: the ``Device`` analog (`crates/lib/src/device.rs`).

The reference wraps ``wgpu::Device`` with default 1x1 textures, a zero-size
default buffer and nearest/linear samplers so passes can bind "nothing"
safely. The JAX analog: adapter info + the default placeholder arrays used
when no probe / noise texture / atlas content is bound (scene/buffers.py
builds those shapes), plus the per-pixel buffer budget helpers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np


@dataclass
class DefaultTextures:
    """1x1 placeholder textures (device.rs:12-56)."""

    filterable_2d: np.ndarray = field(
        default_factory=lambda: np.ones((1, 1, 3), np.float32))
    noise: np.ndarray = field(
        default_factory=lambda: np.full((1, 1, 4), 127, np.uint8))


class Device:
    """Adapter info + defaults (device.rs:12-141)."""

    def __init__(self, index: int = 0):
        self._device = jax.devices()[index]
        self.default_textures = DefaultTextures()

    @property
    def platform(self) -> str:
        return self._device.platform

    @property
    def kind(self) -> str:
        return getattr(self._device, "device_kind", self._device.platform)

    def adapter_info(self) -> dict:
        """Adapter info for the scene-info window (standalone/lib.rs:201-205)."""
        d = self._device
        return {
            "name": str(d),
            "platform": d.platform,
            "kind": getattr(d, "device_kind", "unknown"),
            "id": d.id,
            "memory_stats": self.memory_stats(),
        }

    def memory_stats(self) -> dict:
        try:
            stats = self._device.memory_stats() or {}
            return {k: stats[k] for k in
                    ("bytes_in_use", "bytes_limit") if k in stats}
        except Exception:
            return {}

    def unwrap(self):
        """Deref analog (device.rs:135-141)."""
        return self._device
