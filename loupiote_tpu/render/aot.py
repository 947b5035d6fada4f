"""AOT frame-executable cache: warm interactive startup.

The reference wgpu stack pays shader compilation once and reuses the
pipeline cache across runs; here every fresh PROCESS re-paid 70-94 s of
remote-compile latency for the interactive frame even with the
persistent XLA compile cache hot — the expensive step is per-process
executable loading in the tunneled backend, not XLA compilation
(round-5 cache probe, artifacts/r5_device2/cache_probe_{a,b}.log).

The fix is JAX AOT: ``render_frame.lower(...).compile()`` once, then
``jax.experimental.serialize_executable`` to disk. A later process
deserializes in ~0.5 s and renders immediately — measured process start
to first frame 4.3 s (artifacts/r5_device3/aot_probe.log).

Entries are keyed by a fingerprint of everything that shapes the
executable: static render params, array shapes/dtypes + pytree structure
of (scene, state), and the JAX backend. Loads that do not match the
fingerprint (or any deserialize error: different device, jax version,
...) fall back silently to the jit path.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Optional

import jax
import numpy as np


def _default_dir() -> str:
    return os.environ.get("LOUPIOTE_AOT_DIR",
                          os.path.expanduser("~/.cache/loupiote_aot"))


def fingerprint(scene, state, statics: tuple) -> str:
    """Stable hash of the executable's full identity."""
    h = hashlib.sha256()
    h.update(repr(statics).encode())
    h.update(jax.default_backend().encode())
    h.update(jax.__version__.encode())
    for tree in (scene, state):
        leaves, treedef = jax.tree.flatten(tree)
        h.update(str(treedef).encode())
        for leaf in leaves:
            h.update(str((getattr(leaf, "shape", None),
                          str(getattr(leaf, "dtype", type(leaf))))).encode())
    return h.hexdigest()[:24]


def save(compiled, fp: str, cache_dir: Optional[str] = None) -> str:
    """Serialize a compiled frame executable under its fingerprint."""
    from jax.experimental import serialize_executable

    cache_dir = cache_dir or _default_dir()
    os.makedirs(cache_dir, exist_ok=True)
    payload, in_tree, out_tree = serialize_executable.serialize(compiled)
    path = os.path.join(cache_dir, fp + ".aot")
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump({"fp": fp, "payload": payload, "in_tree": in_tree,
                     "out_tree": out_tree}, f)
    os.replace(tmp, path)
    return path


def load(fp: str, cache_dir: Optional[str] = None):
    """Deserialize the executable for ``fp``, or None (missing/stale/
    incompatible — any failure means 'just jit')."""
    from jax.experimental import serialize_executable

    path = os.path.join(cache_dir or _default_dir(), fp + ".aot")
    try:
        with open(path, "rb") as f:
            d = pickle.load(f)
        if d.get("fp") != fp:
            return None
        return serialize_executable.deserialize_and_load(
            d["payload"], d["in_tree"], d["out_tree"])
    except FileNotFoundError:
        return None
    except Exception:
        return None
