"""Scene data model: CPU-side (numpy) scene + frozen device-side pytrees.

Mirrors the observable data model of the reference renderer:
  - ``Material`` fields follow ``albedo_rtx::uniforms::Material`` as observed in
    loupiote (`crates/lib/src/loaders/gltf.rs:113-126`,
    `crates/lib/src/loaders/binary.rs:63-69`): base color, roughness,
    metallic ("reflectivity"), albedo/mra texture indices with an
    ``INVALID_INDEX`` sentinel.
  - ``Scene`` mirrors `crates/lib/src/scene.rs:30-54`: materials, a BLAS
    array (meshes + instances), lights, images. Default scene = one dummy
    material + one default BLAS entry + one default light.
  - ``SceneBuffers`` is the TPU analog of ``SceneGPU``
    (`crates/lib/src/scene.rs:56-64,123-188`): flat HBM-resident arrays.

TPU-first deviation: instead of a two-level BVH traversed per instance, scene
upload flattens every instance into world space and builds ONE global
threaded BVH over the full triangle soup (the reference only ever builds its
BLAS at load time and never mutates transforms afterwards, so this is
behavior-preserving and removes a level of indirection from the hot loop).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

INVALID_INDEX = np.uint32(0xFFFFFFFF)


@dataclass
class Material:
    """PBR metallic-roughness material (reference: gltf.rs:113-126)."""

    color: np.ndarray = field(default_factory=lambda: np.ones(4, np.float32))
    roughness: float = 1.0
    reflectivity: float = 0.0  # metallic factor; reference names it reflectivity
    albedo_texture: int = int(INVALID_INDEX)
    mra_texture: int = int(INVALID_INDEX)
    emission: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))


@dataclass
class Light:
    """Quad area light.

    The reference keeps a single default ``Light::new()`` in every scene
    (`crates/lib/src/scene.rs:50`; the glTF loader never emits lights).
    We model it as a parallelogram emitter: origin + two edges + emission.
    """

    origin: np.ndarray = field(default_factory=lambda: np.array([-0.5, 0.999, -0.5], np.float32))
    edge_u: np.ndarray = field(default_factory=lambda: np.array([1.0, 0.0, 0.0], np.float32))
    edge_v: np.ndarray = field(default_factory=lambda: np.array([0.0, 0.0, 1.0], np.float32))
    emission: np.ndarray = field(default_factory=lambda: np.array([1.0, 1.0, 1.0], np.float32))
    intensity: float = 10.0

    @staticmethod
    def fit_to_scene(bounds_min, bounds_max, intensity: float = 10.0) -> "Light":
        """Overhead quad light sized/placed for the given scene bounds."""
        bounds_min = np.asarray(bounds_min, np.float32)
        bounds_max = np.asarray(bounds_max, np.float32)
        ext = bounds_max - bounds_min
        cx = (bounds_min + bounds_max) * 0.5
        w = max(float(ext[0]) * 0.3, 1e-3)
        d = max(float(ext[2]) * 0.3, 1e-3)
        y = float(bounds_max[1]) - 0.02 * max(float(ext[1]), 1e-3)
        return Light(
            origin=np.array([cx[0] - w / 2, y, cx[2] - d / 2], np.float32),
            edge_u=np.array([w, 0.0, 0.0], np.float32),
            edge_v=np.array([0.0, 0.0, d], np.float32),
            emission=np.array([1.0, 0.98, 0.95], np.float32),
            intensity=intensity)


@dataclass
class ImageData:
    """RGBA8 image (reference: scene.rs:5-28, gltf.rs:12-44)."""

    data: np.ndarray  # (H, W, 4) uint8
    width: int
    height: int

    @staticmethod
    def from_array(arr: np.ndarray) -> "ImageData":
        assert arr.ndim == 3 and arr.shape[2] == 4 and arr.dtype == np.uint8
        return ImageData(arr, arr.shape[1], arr.shape[0])


@dataclass
class Mesh:
    """One mesh primitive: indexed triangle soup in object space.

    Equivalent to the payload of ``BLASArray::add_bvh_indexed``
    (`crates/lib/src/loaders/gltf.rs:97-106`).
    """

    positions: np.ndarray  # (V, 3) float32
    normals: Optional[np.ndarray]  # (V, 3) float32 or None
    texcoords: Optional[np.ndarray]  # (V, 2) float32 or None
    indices: np.ndarray  # (I,) uint32, I % 3 == 0


@dataclass
class Instance:
    """Mesh instance (reference: BLASArray::add_instance, gltf.rs:141-145)."""

    mesh_index: int
    model_to_world: np.ndarray  # (4, 4) float32, column-major semantics as glam
    material_index: int


@dataclass
class Scene:
    """CPU-side scene, mutated by loaders (reference: scene.rs:30-54)."""

    materials: List[Material] = field(default_factory=list)
    meshes: List[Mesh] = field(default_factory=list)
    instances: List[Instance] = field(default_factory=list)
    lights: List[Light] = field(default_factory=list)
    images: List[ImageData] = field(default_factory=list)

    @staticmethod
    def default() -> "Scene":
        # Reference default: 1 dummy material, 1 default BLAS entry, 1 light
        # (`crates/lib/src/scene.rs:37-53`).
        return Scene(materials=[Material()], lights=[Light()])

    def add_default_light_if_empty(self) -> None:
        if not self.lights:
            self.lights.append(Light())

    def bounds(self):
        """World-space AABB over all instanced geometry (numpy)."""
        lo = np.full(3, np.inf, np.float32)
        hi = np.full(3, -np.inf, np.float32)
        for inst in self.instances:
            mesh = self.meshes[inst.mesh_index]
            m = inst.model_to_world
            pos = mesh.positions @ m[:3, :3].T + m[:3, 3]
            lo = np.minimum(lo, pos.min(axis=0))
            hi = np.maximum(hi, pos.max(axis=0))
        if not np.isfinite(lo).all():
            lo, hi = -np.ones(3, np.float32), np.ones(3, np.float32)
        return lo, hi

    def fit_default_light(self, intensity: float = 10.0) -> None:
        """Place an overhead quad light sized to the scene bounds."""
        lo, hi = self.bounds()
        self.lights = [Light.fit_to_scene(lo, hi, intensity)]

    # -- Stats used by the reference GUI (app.rs:216-236) -------------------
    def stats(self) -> dict:
        tri_count = sum(len(m.indices) // 3 for m in self.meshes)
        vert_count = sum(len(m.positions) for m in self.meshes)
        return {
            "meshes": len(self.meshes),
            "instances": len(self.instances),
            "triangles": tri_count,
            "vertices": vert_count,
            "materials": len(self.materials),
            "lights": len(self.lights),
            "images": len(self.images),
        }


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pad_rows(arr: np.ndarray, n: int, fill=0) -> np.ndarray:
    """Pad the leading dimension of ``arr`` to ``n`` rows with ``fill``."""
    if arr.shape[0] == n:
        return arr
    pad = np.full((n - arr.shape[0],) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)
