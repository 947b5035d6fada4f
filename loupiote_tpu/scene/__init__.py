from .atlas import Atlas, pack_atlas
from .binary import load_binary, load_binary_from_path
from .buffers import SceneBuffers, build_scene_buffers
from .gltf import GltfError, load_gltf, load_gltf_path
from .hdr import Probe, build_probe, load_probe, read_hdr, rgbe_to_float
from .types import (INVALID_INDEX, ImageData, Instance, Light, Material,
                    Mesh, Scene)

__all__ = [
    "Atlas", "pack_atlas", "load_binary", "load_binary_from_path",
    "SceneBuffers", "build_scene_buffers", "GltfError", "load_gltf",
    "load_gltf_path", "Probe", "build_probe", "load_probe", "read_hdr",
    "rgbe_to_float", "INVALID_INDEX", "ImageData", "Instance", "Light",
    "Material", "Mesh", "Scene",
]
