"""Recursive pytree <-> HDF5 persistence (behavioral parity:
track_mjx/analysis/utils.py:10-95). Saves dicts/lists/scalars/arrays/objects
with __dict__ into nested HDF5 groups and reconstructs dicts/lists on load."""

from __future__ import annotations

from typing import Any

import h5py
import numpy as np


def save_to_h5py(group: Any, data: Any, name: str = "root") -> None:
    """Recursively writes `data` under `group` (an h5py File or Group)."""
    if isinstance(group, (str,)):
        with h5py.File(group, "w") as f:
            save_to_h5py(f, data, name)
        return
    if isinstance(data, dict):
        sub = group.create_group(name) if name else group
        for key, value in data.items():
            save_to_h5py(sub, value, str(key))
    elif isinstance(data, (list, tuple)):
        sub = group.create_group(name)
        sub.attrs["__list__"] = True
        for i, value in enumerate(data):
            save_to_h5py(sub, value, str(i))
    elif isinstance(data, (int, float, str, bool, np.integer, np.floating)):
        group.attrs[name] = data
    elif data is None:
        group.attrs[name] = "__none__"
    elif hasattr(data, "shape"):  # numpy / jax arrays
        group.create_dataset(name, data=np.asarray(data))
    elif hasattr(data, "__dict__"):
        save_to_h5py(group, vars(data), name)
    else:
        raise TypeError(f"cannot serialize {type(data)} at {name}")


def load_from_h5py(group: Any) -> Any:
    """Recursively reconstructs dicts/lists/arrays from an HDF5 group/file."""
    if isinstance(group, str):
        with h5py.File(group, "r") as f:
            return load_from_h5py(f)

    def load_node(node):
        if isinstance(node, h5py.Dataset):
            return node[()]
        out = {}
        for key in node.attrs:
            if key == "__list__":
                continue
            v = node.attrs[key]
            out[key] = None if (isinstance(v, str) and v == "__none__") else v
        for key in node.keys():
            out[key] = load_node(node[key])
        if node.attrs.get("__list__", False):
            return [out[str(i)] for i in range(len(out))]
        return out

    result = load_node(group)
    # unwrap the default "root" container
    if isinstance(result, dict) and set(result.keys()) == {"root"}:
        return result["root"]
    return result
