"""LoRA — low-rank adaptation of the LM, the reference's peft integration
(train.py:267-280 `find_all_linear_names`, :1507-1543; archived
finetune_lora.sh recipe) rebuilt functionally:

  - `init_lora` creates (A, B) factor pytrees for every 2-D+ kernel of the
    language model whose path matches the target list (default: all linear
    projections, the `find_all_linear_names` behavior — which excludes
    mm_projector/vision modules, train.py:270-274);
  - `apply_lora` returns merged params `W + scale * A @ B` — used per step
    during training (W frozen under stop_gradient) and once at export for
    the reference's merge-and-save flow;
  - rank/alpha/dropout semantics follow peft (scale = alpha / r).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 8
    alpha: int = 16
    dropout: float = 0.0
    target_modules: Sequence[str] = (
        "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
    )

    @property
    def scale(self) -> float:
        return self.alpha / self.r


from memory_augmented_vlm_tpu.utils.tree import path_str as _path_str


def _is_target(path, leaf, cfg: LoraConfig) -> bool:
    s = _path_str(path)
    return (
        s.startswith("language_model")
        and s.endswith("kernel")
        and any(t in s for t in cfg.target_modules)
        and leaf.ndim >= 2
    )


def init_lora(params: Any, cfg: LoraConfig, key: jax.Array) -> Any:
    """(A, B) factors for each targeted kernel; A ~ N(0, 1/r), B = 0 (peft
    init: adapters start as identity)."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    n = sum(_is_target(p, l, cfg) for p, l in leaves)
    keys = iter(jax.random.split(key, max(n, 1)))

    def make(path, leaf):
        if not _is_target(path, leaf, cfg):
            return None
        *batch, d_in, d_out = leaf.shape
        k = next(keys)
        a = (jax.random.normal(k, (*batch, d_in, cfg.r)) * (1.0 / cfg.r)).astype(leaf.dtype)
        b = jnp.zeros((*batch, cfg.r, d_out), leaf.dtype)
        return {"a": a, "b": b}

    return jax.tree_util.tree_map_with_path(make, params)


def apply_lora(params: Any, lora: Any, cfg: LoraConfig, *,
               freeze_base: bool = False) -> Any:
    """Merged params `W + scale * A@B`; `freeze_base` stops gradients into W
    (training: only the factors learn)."""

    def merge(w, f):
        if f is None:
            return w
        base = jax.lax.stop_gradient(w) if freeze_base else w
        delta = jnp.einsum("...ir,...ro->...io", f["a"], f["b"]) * cfg.scale
        return base + delta.astype(w.dtype)

    return jax.tree.map(merge, params, lora,
                        is_leaf=lambda x: x is None or (isinstance(x, dict) and "a" in x))


def merge_and_unload(params: Any, lora: Any, cfg: LoraConfig) -> Any:
    """The peft merge_and_unload equivalent (builder.py LoRA-merge load path)."""
    return apply_lora(params, lora, cfg, freeze_base=False)


def lora_trainable_mask(params: Any, lora: Any) -> Any:
    """Mask pytree for the optimizer: True only on LoRA factors (params all
    False, factors all True); callers optimize the (params, lora) pair."""
    frozen = jax.tree.map(lambda _: False, params)
    hot = jax.tree.map(lambda _: True, lora)
    return frozen, hot
