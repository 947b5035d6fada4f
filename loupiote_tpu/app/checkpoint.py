"""Checkpoint / resume for render sessions.

The reference has none (SURVEY.md §5); its nearest analogs are the
progressive accumulation state and PNG screenshots. Because our frame state
is a pytree of arrays, checkpointing a render session is a first-class
feature here: save/restore RenderState + settings, so a long progressive
accumulation (or an interactive session) survives restarts.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..config import BlitMode
from ..render.renderer import Renderer, RenderState

_MANIFEST = "manifest.json"


def save_session(path: str, renderer: Renderer) -> None:
    """Write the renderer's device state + settings to ``path`` (a dir)."""
    os.makedirs(path, exist_ok=True)
    state = renderer.state
    arrays = {f: np.asarray(getattr(state, f))
              for f in state.__dataclass_fields__}
    np.savez_compressed(os.path.join(path, "state.npz"), **arrays)
    manifest = {
        "size": list(renderer.size),
        "accumulate": renderer.accumulate,
        "mode": renderer.mode.value,
        "use_noise": renderer.use_noise,
        "version": 1,
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f)


def load_session(path: str, renderer: Renderer) -> None:
    """Restore state saved by save_session into ``renderer`` (sizes must
    match; resize first if needed)."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    version = manifest.get("version")
    if version != 1:
        raise ValueError(f"unsupported checkpoint version {version!r} "
                         f"(this build reads version 1)")
    size = tuple(manifest["size"])
    if tuple(renderer.size) != size:
        raise ValueError(
            f"checkpoint size {size} != renderer size {renderer.size}")
    data = np.load(os.path.join(path, "state.npz"))
    known = set(RenderState.__dataclass_fields__)
    unknown = sorted(set(data.files) - known)
    if unknown:
        raise ValueError(
            f"checkpoint has fields unknown to this RenderState layout: "
            f"{unknown} (written by a newer build?)")
    # Fields added since the checkpoint was written keep the fresh-state
    # defaults from the renderer's current (size-matched) state.
    fields = {f: (jnp.asarray(data[f]) if f in data.files
                  else getattr(renderer.state, f))
              for f in known}
    renderer.state = RenderState(**fields)
    renderer.accumulate = bool(manifest["accumulate"])
    renderer.mode = BlitMode(manifest["mode"])
    renderer.use_noise = bool(manifest["use_noise"])


def checkpoint_info(path: str) -> Tuple[dict, int]:
    """(manifest, frame_count) for either backend (npz or orbax)."""
    manifest = json.loads(_epath(path, _MANIFEST).read_text())
    if "frame_count" in manifest:
        return manifest, int(manifest["frame_count"])
    data = np.load(os.path.join(path, "state.npz"))
    return manifest, int(data["frame_count"])


# -- Orbax backend (cloud-storage paths, async-capable) -----------------------

def _is_url(path: str) -> bool:
    return "://" in path


def _epath(path: str, *parts: str):
    """URL-aware path join: etils.epath handles gs://... URIs that
    os.path.abspath would mangle into a local './gs:/...' directory."""
    from etils import epath

    return epath.Path(path).joinpath(*parts)


def save_session_orbax(path: str, renderer: Renderer) -> None:
    """Orbax-backed save: same manifest, state as an Orbax PyTree
    checkpoint. Use for cloud storage paths (gs://...) where npz files
    can't be written directly; local paths work too."""
    import orbax.checkpoint as ocp

    if not _is_url(path):
        path = os.path.abspath(path)
        os.makedirs(path, exist_ok=True)
    state = renderer.state
    tree = {f: getattr(state, f) for f in state.__dataclass_fields__}
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(str(_epath(path, "state_orbax")), tree, force=True)
    manifest = {
        "size": list(renderer.size),
        "accumulate": renderer.accumulate,
        "mode": renderer.mode.value,
        "use_noise": renderer.use_noise,
        "frame_count": int(np.asarray(state.frame_count)),
        "version": 1,
        "backend": "orbax",
    }
    _epath(path, _MANIFEST).write_text(json.dumps(manifest))


def load_session_orbax(path: str, renderer: Renderer) -> None:
    """Restore a save_session_orbax checkpoint (same validation rules as
    the npz loader)."""
    import orbax.checkpoint as ocp

    if not _is_url(path):
        path = os.path.abspath(path)
    manifest = json.loads(_epath(path, _MANIFEST).read_text())
    if manifest.get("version") != 1:
        raise ValueError(f"unsupported checkpoint version "
                         f"{manifest.get('version')!r}")
    size = tuple(manifest["size"])
    if tuple(renderer.size) != size:
        raise ValueError(
            f"checkpoint size {size} != renderer size {renderer.size}")
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(str(_epath(path, "state_orbax")))
    known = set(RenderState.__dataclass_fields__)
    unknown = sorted(set(tree) - known)
    if unknown:
        raise ValueError(
            f"checkpoint has fields unknown to this RenderState layout: "
            f"{unknown} (written by a newer build?)")
    fields = {f: (jnp.asarray(tree[f]) if f in tree
                  else getattr(renderer.state, f))
              for f in known}
    renderer.state = RenderState(**fields)
    renderer.accumulate = bool(manifest["accumulate"])
    renderer.mode = BlitMode(manifest["mode"])
    renderer.use_noise = bool(manifest["use_noise"])
