"""Parameter checkpoint save/load (safetensors, offline, framework-native).

The reference has no checkpointing of its own (SURVEY §5: model files come
from external caches). Here converted/fine-tuned parameter trees round-trip
through a single .safetensors file: flatten the pytree with '/'-joined paths,
save as numpy, rebuild the nesting on load. Avoids re-running the torch
converters on every startup and stores fine-tuned weights.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _path_str(kp) -> str:
    parts = []
    for k in kp:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def save_params(params: Any, path: str) -> None:
    """Write a parameter pytree to one .safetensors file."""
    from safetensors.numpy import save_file

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    tensors = {}
    for kp, leaf in flat:
        arr = np.asarray(leaf)
        if arr.dtype.name == "bfloat16":  # store widened; reload with dtype=
            arr = arr.astype(np.float32)
        tensors[_path_str(kp)] = np.ascontiguousarray(arr)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file(tensors, path)


def load_params(path: str, dtype=None) -> Any:
    """Read a .safetensors parameter file back into a nested dict tree."""
    from safetensors.numpy import load_file

    import jax.numpy as jnp

    flat = load_file(path)
    tree: dict = {}
    for key, arr in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr, dtype) if dtype is not None else jnp.asarray(arr)
    return tree
