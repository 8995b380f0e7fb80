"""Parameter/activation sharding rules.

Replaces the reference's ZeRO-2/3 configs (scripts/zero*.json) with explicit
`NamedSharding`s over the (data, fsdp, tp) mesh:

  - LM layer kernels `(L, in, out)`: TP shards the model-parallel axis
    (out for q/k/v/gate/up, in for o/down — Megatron layout, so each block
    needs exactly one psum, inserted by XLA), FSDP shards the other axis.
  - embeddings / lm_head: vocab axis on fsdp, hidden on tp.
  - vision tower + memory modules: FSDP only (they are small; TP overhead
    would not pay off — 196-token attention is latency-bound).
  - everything tiny (norms, biases) replicated.

`shard_params` applies the rules to a concrete pytree with `jax.device_put`;
`param_pspecs` returns the matching PartitionSpec pytree for pjit in/out specs.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _lm_layer_rules() -> dict:
    # every stacked entry's leading axis is the LAYER axis: it shards over
    # `pp` (pipeline stages each hold L/P contiguous layers — a size-1 no-op
    # on meshes without pipeline parallelism; ops/pipeline.py)
    return {
        "input_layernorm": P("pp", None),
        "post_attention_layernorm": P("pp", None),
        "q_proj": {"kernel": P("pp", "fsdp", "tp"), "bias": P("pp", "tp")},
        "k_proj": {"kernel": P("pp", "fsdp", "tp"), "bias": P("pp", "tp")},
        "v_proj": {"kernel": P("pp", "fsdp", "tp"), "bias": P("pp", "tp")},
        "o_proj": {"kernel": P("pp", "tp", "fsdp")},
        "gate_proj": {"kernel": P("pp", "fsdp", "tp")},
        "up_proj": {"kernel": P("pp", "fsdp", "tp")},
        "down_proj": {"kernel": P("pp", "tp", "fsdp")},
        # Mixtral/Qwen2MoE experts: the expert axis shards over (fsdp, ep) =
        # expert parallelism (each device computes its local experts for all
        # tokens; the zero-masked weighted sum reduces with one psum), tp
        # still splits the expert FFN. A dedicated `ep` mesh axis keeps dense
        # params replicated across expert ranks while experts split E-ways.
        "moe_gate": {"kernel": P("pp", "fsdp", None)},
        "experts": {
            "gate_proj": {"kernel": P("pp", ("fsdp", "ep"), None, "tp")},
            "up_proj": {"kernel": P("pp", ("fsdp", "ep"), None, "tp")},
            "down_proj": {"kernel": P("pp", ("fsdp", "ep"), "tp", None)},
        },
        # Qwen2MoE shared expert: a plain dense SwiGLU beside the routed
        # experts (same layout as the dense MLP); the scalar gate replicates
        "shared_expert": {
            "gate_proj": {"kernel": P("pp", "fsdp", "tp")},
            "up_proj": {"kernel": P("pp", "fsdp", "tp")},
            "down_proj": {"kernel": P("pp", "tp", "fsdp")},
        },
        "shared_expert_gate": {"kernel": P("pp", "fsdp", None)},
    }


def _vision_rules() -> dict:
    # prequantized entries (tower_int8) shard like their fp counterparts so
    # the int8 memory halving survives FSDP (replicated int8 would cost 4x
    # the per-device HBM of fsdp-sharded bf16 on an 8-way mesh)
    dense_io = {"kernel": P(None, None, "fsdp"), "bias": P(None, "fsdp"),
                "kernel_int8": P(None, None, "fsdp"), "scale": P(None, "fsdp")}
    return {
        "patch_embedding": {"kernel": P(None, None, None, "fsdp"), "bias": P("fsdp")},
        "position_embedding": P(None, "fsdp"),
        "layers": {
            "layer_norm1": {"weight": P(None, None), "bias": P(None, None)},
            "layer_norm2": {"weight": P(None, None), "bias": P(None, None)},
            "q_proj": dict(dense_io),
            "k_proj": dict(dense_io),
            "v_proj": dict(dense_io),
            "out_proj": dict(dense_io),
            "fc1": dict(dense_io),
            "fc2": dict(dense_io),
        },
        "post_layernorm": {"weight": P(), "bias": P()},
    }


def _memory_attention_rules() -> dict:
    dense = {"kernel": P(None, "fsdp"), "bias": P("fsdp")}
    return {
        "q_proj": dict(dense),
        "k_proj": dict(dense),
        "v_proj": dict(dense),
        "residual": {
            "dense": dict(dense),
            "layernorm": {"weight": P(), "bias": P()},
        },
    }


def _memory_rules() -> dict:
    def stacked(d):
        return jax.tree.map(
            lambda spec: P(*((None,) + tuple(spec))), d,
            is_leaf=lambda x: isinstance(x, P),
        )

    return {
        "recurrent_memory_transformer": {
            "initial_memory": P(None, "fsdp", None),
            "memory_pos_embed": P(None, None, None),
            "memory_update_attention": _memory_attention_rules(),
            "layers": stacked({
                "attention": _memory_attention_rules(),
                "mlp": {"kernel": P(None, "fsdp"), "bias": P("fsdp")},
                "residual": {
                    "dense": {"kernel": P("fsdp", None), "bias": P()},
                    "layernorm": {"weight": P(), "bias": P()},
                },
            }),
        },
        "memory_fuser": {
            "fc1": {"kernel": P(None, "fsdp"), "bias": P("fsdp")},
            "fc2": {"kernel": P("fsdp", None), "bias": P()},
        },
        "token_type_embedding": P(None, None),
        "image_newline": P(None),
    }


def vlm_param_pspecs(params: Any) -> Any:
    """PartitionSpec pytree matching a VLM param pytree (models/vlm.py)."""
    lm_rules = {
        "embed_tokens": P("fsdp", "tp"),
        "layers": _lm_layer_rules(),
        "norm": P(None),
        "lm_head": P("tp", "fsdp"),
    }
    rules = {
        "vision_tower": _vision_rules(),
        "mm_projector": {"layers": [
            {"kernel": P(None, "fsdp"), "bias": P("fsdp")}
            for _ in params.get("mm_projector", {}).get("layers", [])
        ]},
        "language_model": lm_rules,
        "memory": _memory_rules(),
        "positional_encoding": {"frame_embed": P(None, None)},
    }

    def match(rule, param):
        if isinstance(param, dict):
            return {k: match(rule[k], v) if isinstance(rule, dict) and k in rule
                    else jax.tree.map(lambda _: P(), v)
                    for k, v in param.items()}
        if isinstance(param, (list, tuple)):
            return type(param)(match(r, p) for r, p in zip(rule, param))
        if isinstance(rule, P):
            # trim/extend the spec to the param's rank
            if len(rule) > param.ndim:
                rule = P(*tuple(rule)[: param.ndim])
            return P(*(tuple(rule) + (None,) * (param.ndim - len(tuple(rule)))))
        return P()

    return match(rules, params)


def lm_param_pspecs(params: Any) -> Any:
    """PartitionSpec pytree for a bare Qwen2 param pytree."""
    full = vlm_param_pspecs({"language_model": params})
    return full["language_model"]


def _divisible(dim: int, mesh: Mesh, names) -> bool:
    size = 1
    for n in (names,) if isinstance(names, str) else names:
        size *= mesh.shape[n]
    return dim % size == 0


def sanitize_pspecs(pspecs: Any, params: Any, mesh: Mesh) -> Any:
    """Replace specs whose sharded dims don't divide the mesh axis size with
    replication on that dim (keeps tiny test models shardable)."""

    def fix(spec, param):
        if not isinstance(spec, P):
            return spec
        out = []
        for axis, names in enumerate(tuple(spec)):
            if names is None or _divisible(param.shape[axis], mesh, names):
                out.append(names)
            else:
                out.append(None)
        return P(*out)

    return jax.tree.map(fix, pspecs, params, is_leaf=lambda x: isinstance(x, P))


def constrain(x: jax.Array, spec: P) -> jax.Array:
    """`with_sharding_constraint` that no-ops outside a mesh context.

    Used to pin activation shardings (e.g. CE logits to
    ``P(("data","fsdp"), None, "tp")``) so their *cotangents* are born with
    the layout the parameter-gradient matmuls need — without one, GSPMD
    builds the vocab-sized d_logits batch-sharded and pays an involuntary
    full rematerialization resharding it to the tp-sharded lm_head grad.
    Silently skipped when there is no ambient mesh, when the spec names axes
    the mesh lacks, or on dims the mesh axis size doesn't divide.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        return x
    axis_names = set(mesh.axis_names)
    out = []
    for dim, names in enumerate(tuple(spec)):
        if names is None:
            out.append(None)
            continue
        group = (names,) if isinstance(names, str) else tuple(names)
        size = 1
        ok = True
        for n in group:
            if n not in axis_names:
                ok = False
                break
            size *= mesh.shape[n]
        if ok and dim < x.ndim and x.shape[dim] % size == 0:
            out.append(names)
        else:
            out.append(None)
    if all(n is None for n in out):
        return x
    return jax.lax.with_sharding_constraint(x, P(*out))


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a VLM param pytree onto the mesh per the rules above."""
    pspecs = sanitize_pspecs(vlm_param_pspecs(params), params, mesh)
    return jax.device_put(
        params, jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    )
