"""Shared pytree helpers."""

from __future__ import annotations


def path_str(path) -> str:
    """jax key-path -> dotted string ("layers.q_proj.kernel")."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)
