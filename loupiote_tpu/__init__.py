"""loupiote_tpu: a TPU-native interactive path tracer.

Brand-new JAX/XLA/Pallas framework with the capabilities of
DavidPeicho/loupiote (Rust/wgpu progressive path tracer + A-SVGF denoiser).
Public façade mirrors `crates/lib/src/lib.rs:1-11`: device info, errors,
renderer, scene + loaders.
"""

from . import app, config, denoise, ops, parallel, render, scene
from .config import BlitMode, RenderConfig, Settings
from .device import Device
from .errors import AccelBuild, Error, FileNotFound, TextureToBufferReadFail
from .render import Camera, CameraController, Renderer
from .scene import (Scene, SceneBuffers, build_scene_buffers,
                    load_binary_from_path, load_gltf, load_gltf_path,
                    load_probe)

__version__ = "0.1.0"

__all__ = [
    "app", "config", "denoise", "ops", "parallel", "render", "scene",
    "BlitMode", "RenderConfig", "Settings", "Device",
    "AccelBuild", "Error", "FileNotFound", "TextureToBufferReadFail",
    "Camera", "CameraController", "Renderer",
    "Scene", "SceneBuffers", "build_scene_buffers",
    "load_binary_from_path", "load_gltf", "load_gltf_path", "load_probe",
]
