"""Pytree <-> flat ``.npz`` serialization for converted model weights.

Why: the torch checkpoints ship as pickles, so every consumer of converted
weights (extraction hosts, serving hosts) would need torch installed just
to unpickle them.  ``cli.convert_weights`` materialises the converted
pytrees once into a plain ``.npz`` (plus a JSON sidecar entry for
non-array metadata like ``BertDims``), after which serving/extraction
load with numpy alone.

Layout: dict keys join with ``/``; list/tuple elements use their index as
a key segment (``encoder/layer1/0/conv1/kernel``).  Lists are recovered
by contiguous integer segments, so round-tripping preserves the exact
structure the model code expects.  Trees that could NOT round-trip are
rejected at save time with a clear error: empty dicts/lists (their key
would vanish), digit-string dict keys (ambiguous with list indices), and
the reserved metadata key.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import numpy as np

_META_KEY = "__meta_json__"


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]) -> None:
    if isinstance(tree, dict):
        if not tree:
            raise ValueError(f"empty dict at {prefix!r} cannot round-trip")
        for k, v in tree.items():
            k = str(k)
            if "/" in k:
                raise ValueError(f"key {k!r} contains '/'")
            if k == _META_KEY:
                raise ValueError(f"key {k!r} is reserved for metadata")
            if k.isdigit():
                # digit-string dict keys are indistinguishable from list
                # indices on load and would silently come back as a list
                raise ValueError(f"digit-string dict key {k!r} at {prefix!r}")
            _flatten(v, f"{prefix}{k}/", out)
    elif isinstance(tree, (list, tuple)):
        if not tree:
            raise ValueError(f"empty list at {prefix!r} cannot round-trip")
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}{i}/", out)
    else:
        arr = np.asarray(tree)
        if arr.dtype == object:
            # np.savez would silently PICKLE object arrays (None, mixed
            # types); the load side (allow_pickle=False) then fails on the
            # serving host — reject here, at conversion time
            raise ValueError(
                f"leaf at {prefix[:-1]!r} is not a numeric array "
                f"(got {type(tree).__name__})"
            )
        out[prefix[:-1]] = arr


def save_params_npz(path: str, tree: Any, meta: dict | None = None) -> None:
    flat: Dict[str, np.ndarray] = {}
    _flatten(tree, "", flat)
    if meta is not None:
        flat[_META_KEY] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        ).copy()
    np.savez(path, **flat)


def _insert(root: dict, segments, value) -> None:
    node = root
    for seg in segments[:-1]:
        node = node.setdefault(seg, {})
    node[segments[-1]] = value


def _listify(node: Any) -> Any:
    """Convert dicts whose keys are exactly 0..n-1 (as strings) to lists."""
    if not isinstance(node, dict):
        return node
    node = {k: _listify(v) for k, v in node.items()}
    keys = list(node.keys())
    if keys and all(k.isdigit() for k in keys):
        idx = sorted(int(k) for k in keys)
        if idx == list(range(len(idx))):
            return [node[str(i)] for i in idx]
    return node


def load_params_npz(path: str):
    """Returns (tree, meta_dict_or_None)."""
    with np.load(path) as z:
        meta = None
        root: dict = {}
        for key in z.files:
            if key == _META_KEY:
                meta = json.loads(bytes(z[key]).decode())
                continue
            _insert(root, key.split("/"), z[key])
    return _listify(root), meta
