"""Weight delta / consolidation utilities.

Capability parity with llava/model/{apply_delta,make_delta,consolidate}.py:
publishable deltas vs a base LM and their re-application, over param pytrees
(works on any checkpoint our importers read).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax


def make_delta(base_params: Any, target_params: Any) -> Any:
    """target - base for shared leaves; leaves absent from base (multimodal
    modules) are stored whole (make_delta.py semantics: embeddings handled by
    shape, extra keys pass through)."""

    def sub(path, t):
        b = _lookup(base_params, path)
        if b is None:
            return np.asarray(t)
        b, t = np.asarray(b), np.asarray(t)
        if b.shape != t.shape:  # e.g. resized embeddings: delta on the overlap
            out = t.copy()
            sl = tuple(slice(0, min(bs, ts)) for bs, ts in zip(b.shape, t.shape))
            out[sl] = t[sl] - b[sl]
            return out
        return t - b

    return jax.tree_util.tree_map_with_path(sub, target_params)


def apply_delta(base_params: Any, delta_params: Any) -> Any:
    """Inverse of make_delta (apply_delta.py semantics)."""

    def add(path, d):
        b = _lookup(base_params, path)
        if b is None:
            return np.asarray(d)
        b, d = np.asarray(b), np.asarray(d)
        if b.shape != d.shape:
            out = d.copy()
            sl = tuple(slice(0, min(bs, ds)) for bs, ds in zip(b.shape, d.shape))
            out[sl] = d[sl] + b[sl]
            return out
        return b + d

    return jax.tree_util.tree_map_with_path(add, delta_params)


def _lookup(tree: Any, path) -> Any:
    node = tree
    for p in path:
        key = getattr(p, "key", getattr(p, "idx", None))
        try:
            node = node[key]
        except (KeyError, IndexError, TypeError):
            return None
    return node


def consolidate(params: Any, dtype=np.float16) -> Any:
    """Cast a pytree to a storage dtype (consolidate.py: save fp16 full model)."""
    return jax.tree.map(lambda x: np.asarray(x, dtype), params)
