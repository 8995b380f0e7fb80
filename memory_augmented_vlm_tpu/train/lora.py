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

# QLoRA: LoRA factors ride over quantized frozen kernels too — the
# reference's bits=4/8 peft path (train.py:1507-1543). Quantized entries use
# the prequantized keys from qwen2.prequantize_int8.
_KERNEL_KEYS = ("kernel", "kernel_int8", "kernel_int4")


def _is_target(path, leaf, cfg: LoraConfig) -> bool:
    s = _path_str(path)
    return (
        s.startswith("language_model")
        and s.endswith(_KERNEL_KEYS)
        and any(t in s for t in cfg.target_modules)
        and leaf.ndim >= 2
    )


def _logical_in_dim(path_str: str, leaf) -> int:
    # packed int4 stores two K values per byte along the contraction axis
    return leaf.shape[-2] * (2 if path_str.endswith("kernel_int4") else 1)


def init_lora(params: Any, cfg: LoraConfig, key: jax.Array) -> Any:
    """(A, B) factors for each targeted kernel; A ~ N(0, 1/r), B = 0 (peft
    init: adapters start as identity). Factors are bf16 over quantized
    bases (QLoRA), the kernel dtype otherwise."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    n = sum(_is_target(p, l, cfg) for p, l in leaves)
    keys = iter(jax.random.split(key, max(n, 1)))

    def make(path, leaf):
        if not _is_target(path, leaf, cfg):
            return None
        s = _path_str(path)
        *batch, _, d_out = leaf.shape
        d_in = _logical_in_dim(s, leaf)
        dtype = leaf.dtype if s.endswith("kernel") else jnp.bfloat16
        k = next(keys)
        a = (jax.random.normal(k, (*batch, d_in, cfg.r)) * (1.0 / cfg.r)).astype(dtype)
        b = jnp.zeros((*batch, cfg.r, d_out), dtype)
        return {"a": a, "b": b}

    return jax.tree_util.tree_map_with_path(make, params)


def _is_proj_dict(x) -> bool:
    return isinstance(x, dict) and any(k in x for k in _KERNEL_KEYS)


def _dequant_kernel(p: dict) -> jax.Array:
    """Full-precision view of a (possibly quantized) projection kernel."""
    if "kernel" in p:
        return p["kernel"]
    from memory_augmented_vlm_tpu.ops.quant import unpack_int4

    if "kernel_int8" in p:
        w = p["kernel_int8"].astype(jnp.float32)
    else:
        w = unpack_int4(p["kernel_int4"]).astype(jnp.float32)
    return (w * jnp.expand_dims(p["scale"], -2)).astype(jnp.bfloat16)


def apply_lora(params: Any, lora: Any, cfg: LoraConfig, *,
               freeze_base: bool = False) -> Any:
    """Merged params `W + scale * A@B`; `freeze_base` stops gradients into W
    (training: only the factors learn). Quantized bases (QLoRA) are
    dequantized transiently to a plain `kernel` entry — the frozen base
    stays stored in int8/int4, gradients reach only the factors."""

    def merge(p, f):
        if not _is_proj_dict(p):
            return p
        kernel_key = next(k for k in _KERNEL_KEYS if k in p)
        fac = f.get(kernel_key) if isinstance(f, dict) else None
        if fac is None:
            return p
        base = _dequant_kernel(p)
        if freeze_base:
            base = jax.lax.stop_gradient(base)
        delta = jnp.einsum("...ir,...ro->...io", fac["a"], fac["b"]) * cfg.scale
        out = {"kernel": base + delta.astype(base.dtype)}
        if "bias" in p:
            out["bias"] = p["bias"]
        return out

    return jax.tree.map(merge, params, lora, is_leaf=_is_proj_dict)


def merge_and_unload(params: Any, lora: Any, cfg: LoraConfig) -> Any:
    """The peft merge_and_unload equivalent (builder.py LoRA-merge load path)."""
    return apply_lora(params, lora, cfg, freeze_base=False)


def lora_trainable_mask(params: Any, lora: Any) -> Any:
    """Mask pytree for the optimizer: True only on LoRA factors (params all
    False, factors all True); callers optimize the (params, lora) pair."""
    frozen = jax.tree.map(lambda _: False, params)
    hot = jax.tree.map(lambda _: True, lora)
    return frozen, hot
