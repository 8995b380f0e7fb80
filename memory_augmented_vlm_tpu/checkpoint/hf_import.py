"""HF checkpoint -> JAX pytree converters.

Covers the weights the flagship model needs (SURVEY.md §7 step 2):
  - Qwen2 LM                       (`model.*` / bare HF Qwen2 keys)
  - SigLIP SO400M vision tower     (`vision_tower.vision_tower.vision_model.*`
                                    or bare `vision_model.*` keys)
  - mlp2x_gelu projector           (`mm_projector.{0,2}.*`)
  - memory modules                 (`recurrent_memory_transformer.*`,
                                    `memory_fuser.*`, `token_type_embedding.*`,
                                    `image_newline`) — key names match the
                                    reference state dict so its checkpoints
                                    load directly (llava_arch.py:103-151).

Input is a flat `{name: numpy array}` dict — from `safetensors` shards or a
torch `state_dict()` (tests build tiny HF models in-memory).

Layout conventions of the target pytree:
  - linear kernels are stored **transposed vs torch** (in_dim, out_dim) so the
    forward is `x @ W` with no transposes on device;
  - per-layer tensors are **stacked** along a leading layer axis for
    `lax.scan` (models/qwen2.py, models/siglip.py, models/memory.py).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict

import numpy as np

__all__ = [
    "load_safetensors_dir",
    "convert_qwen2",
    "convert_mixtral",
    "convert_siglip",
    "convert_projector",
    "convert_memory_modules",
    "torch_state_dict_to_numpy",
]


def torch_state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """torch state_dict -> {name: np.ndarray(float32)}."""
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().to("cpu").float().numpy()
    return out


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors shards in a checkpoint directory."""
    from safetensors import safe_open

    index_file = os.path.join(path, "model.safetensors.index.json")
    files = []
    if os.path.exists(index_file):
        with open(index_file) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    else:
        files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    tensors: Dict[str, np.ndarray] = {}
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                arr = f.get_tensor(key)
                if arr.dtype.kind not in "fiu":
                    # bfloat16 surfaces as a 2-byte void dtype through the
                    # numpy framework — reinterpret and upcast (the real
                    # flagship checkpoints are published in bf16)
                    if arr.dtype.itemsize == 2:
                        import ml_dtypes

                        arr = arr.view(ml_dtypes.bfloat16).astype(np.float32)
                    else:
                        raise ValueError(
                            f"unhandled dtype for {key}: {arr.dtype}")
                tensors[key] = arr
    return tensors


def _strip_prefix(sd: Dict[str, np.ndarray], prefixes) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                out[k[len(p):]] = v
                break
    return out if out else dict(sd)


def _stack(sd: Dict[str, np.ndarray], pattern: str, num: int, transpose=False) -> np.ndarray:
    """Stack `pattern.format(i)` over i, optionally transposing 2-D kernels."""
    mats = []
    for i in range(num):
        m = sd[pattern.format(i)]
        mats.append(m.T if transpose else m)
    return np.stack(mats).astype(np.float32)


def _qkv_entry(sd: Dict[str, np.ndarray], prefix: str, L: int) -> dict:
    """QKV projection entry; biases exist for Qwen2, not for Llama-family."""
    out = {"kernel": _stack(sd, prefix + ".weight", L, transpose=True)}
    if (prefix + ".bias").format(0) in sd:
        out["bias"] = _stack(sd, prefix + ".bias", L)
    return out


def convert_llama(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Llama/Mistral-family weights -> the same decoder pytree (no qkv bias).
    Shares the Qwen2 converter — key names are identical minus biases."""
    return convert_qwen2(sd, cfg)


def convert_mixtral(sd: Dict[str, np.ndarray], cfg) -> dict:
    """HF Mixtral weights -> the MoE decoder pytree.

    Attention/norm keys match Llama; the MLP is `block_sparse_moe` with a
    router `gate.weight (E, H)` and per-expert `experts.N.w{1,2,3}.weight`
    (w1=gate, w3=up, w2=down) — stacked to (L, E, ...) kernels for the
    scan + dense-dispatch MoE block (models/qwen2.py::_moe_mlp).
    """
    sd = {k: v for k, v in sd.items()}
    if any(k.startswith("model.embed_tokens") for k in sd):
        sd = {re.sub(r"^model\.", "", k): v for k, v in sd.items()}
    L, E = cfg.num_hidden_layers, cfg.num_local_experts
    p = "layers.{}."
    layers = {
        "input_layernorm": _stack(sd, p + "input_layernorm.weight", L),
        "post_attention_layernorm": _stack(sd, p + "post_attention_layernorm.weight", L),
        "q_proj": _qkv_entry(sd, p + "self_attn.q_proj", L),
        "k_proj": _qkv_entry(sd, p + "self_attn.k_proj", L),
        "v_proj": _qkv_entry(sd, p + "self_attn.v_proj", L),
        "o_proj": {"kernel": _stack(sd, p + "self_attn.o_proj.weight", L, transpose=True)},
        "moe_gate": {"kernel": _stack(sd, p + "block_sparse_moe.gate.weight", L,
                                      transpose=True)},
    }

    def experts(w: str, transpose: bool) -> np.ndarray:
        out = np.stack([
            np.stack([
                np.asarray(sd[f"layers.{l}.block_sparse_moe.experts.{e}.{w}.weight"])
                for e in range(E)
            ])
            for l in range(L)
        ]).astype(np.float32)
        return out.transpose(0, 1, 3, 2) if transpose else out

    layers["experts"] = {
        "gate_proj": {"kernel": experts("w1", transpose=True)},
        "up_proj": {"kernel": experts("w3", transpose=True)},
        "down_proj": {"kernel": experts("w2", transpose=True)},
    }
    params = {
        "embed_tokens": sd["embed_tokens.weight"].astype(np.float32),
        "layers": layers,
        "norm": sd["norm.weight"].astype(np.float32),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = sd["lm_head.weight"].T.astype(np.float32)
    return params


def convert_qwen2_moe(sd: Dict[str, np.ndarray], cfg) -> dict:
    """HF Qwen2MoE weights -> the MoE decoder pytree
    (llava/model/language_model/llava_qwen_moe.py via HF Qwen2MoeForCausalLM).

    Attention carries qkv bias like Qwen2; the MLP is `mlp` with router
    `gate.weight (E, H)`, per-expert `experts.N.{gate,up,down}_proj.weight`,
    a shared expert of its own intermediate size, and a scalar sigmoid gate
    `shared_expert_gate.weight (1, H)`.
    """
    sd = {k: v for k, v in sd.items()}
    if any(k.startswith("model.embed_tokens") for k in sd):
        sd = {re.sub(r"^model\.", "", k): v for k, v in sd.items()}
    L, E = cfg.num_hidden_layers, cfg.num_local_experts
    p = "layers.{}."
    layers = {
        "input_layernorm": _stack(sd, p + "input_layernorm.weight", L),
        "post_attention_layernorm": _stack(sd, p + "post_attention_layernorm.weight", L),
        "q_proj": _qkv_entry(sd, p + "self_attn.q_proj", L),
        "k_proj": _qkv_entry(sd, p + "self_attn.k_proj", L),
        "v_proj": _qkv_entry(sd, p + "self_attn.v_proj", L),
        "o_proj": {"kernel": _stack(sd, p + "self_attn.o_proj.weight", L, transpose=True)},
        "moe_gate": {"kernel": _stack(sd, p + "mlp.gate.weight", L,
                                      transpose=True)},
    }

    def experts(w: str) -> np.ndarray:
        out = np.stack([
            np.stack([
                np.asarray(sd[f"layers.{l}.mlp.experts.{e}.{w}.weight"])
                for e in range(E)
            ])
            for l in range(L)
        ]).astype(np.float32)
        return out.transpose(0, 1, 3, 2)

    layers["experts"] = {
        "gate_proj": {"kernel": experts("gate_proj")},
        "up_proj": {"kernel": experts("up_proj")},
        "down_proj": {"kernel": experts("down_proj")},
    }
    layers["shared_expert"] = {
        w: {"kernel": _stack(sd, p + f"mlp.shared_expert.{w}.weight", L,
                             transpose=True)}
        for w in ("gate_proj", "up_proj", "down_proj")
    }
    layers["shared_expert_gate"] = {
        "kernel": _stack(sd, p + "mlp.shared_expert_gate.weight", L,
                         transpose=True)}
    params = {
        "embed_tokens": sd["embed_tokens.weight"].astype(np.float32),
        "layers": layers,
        "norm": sd["norm.weight"].astype(np.float32),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = sd["lm_head.weight"].T.astype(np.float32)
    return params


def convert_qwen2(sd: Dict[str, np.ndarray], cfg) -> dict:
    """HF Qwen2 weights -> models/qwen2.py param pytree.

    Accepts keys with or without the `model.` prefix (LlavaQwen checkpoints
    prefix the LM under `model.` and keep multimodal modules beside it).
    """
    sd = {k: v for k, v in sd.items()}
    # normalize: strip "model." prefix from LM keys if present
    if any(k.startswith("model.embed_tokens") for k in sd):
        sd = {re.sub(r"^model\.", "", k): v for k, v in sd.items()}
    L = cfg.num_hidden_layers
    p = "layers.{}."
    layers = {
        "input_layernorm": _stack(sd, p + "input_layernorm.weight", L),
        "post_attention_layernorm": _stack(sd, p + "post_attention_layernorm.weight", L),
        "q_proj": _qkv_entry(sd, p + "self_attn.q_proj", L),
        "k_proj": _qkv_entry(sd, p + "self_attn.k_proj", L),
        "v_proj": _qkv_entry(sd, p + "self_attn.v_proj", L),
        "o_proj": {"kernel": _stack(sd, p + "self_attn.o_proj.weight", L, transpose=True)},
        "gate_proj": {"kernel": _stack(sd, p + "mlp.gate_proj.weight", L, transpose=True)},
        "up_proj": {"kernel": _stack(sd, p + "mlp.up_proj.weight", L, transpose=True)},
        "down_proj": {"kernel": _stack(sd, p + "mlp.down_proj.weight", L, transpose=True)},
    }
    params = {
        "embed_tokens": sd["embed_tokens.weight"].astype(np.float32),
        "layers": layers,
        "norm": sd["norm.weight"].astype(np.float32),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = sd["lm_head.weight"].T.astype(np.float32)
    return params


def convert_mpt(sd: Dict[str, np.ndarray], cfg) -> dict:
    """HF MPT weights -> models/qwen2.py param pytree (alibi/layernorm/
    ungated-MLP flags). HF layout (MptForCausalLM): `transformer.wte`,
    `transformer.blocks.{i}.norm_1/attn.Wqkv/attn.out_proj/norm_2/
    ffn.up_proj/ffn.down_proj`, `transformer.norm_f`; fused Wqkv splits
    into equal q/k/v thirds (MPT is MHA: n_kv == n_heads)."""
    sd = {k: v for k, v in sd.items()}
    if any(k.startswith("model.transformer") for k in sd):
        sd = {re.sub(r"^model\.", "", k): v for k, v in sd.items()}
    L = cfg.num_hidden_layers
    h = cfg.hidden_size
    qs, ks_, vs = [], [], []
    for i in range(L):
        wqkv = sd[f"transformer.blocks.{i}.attn.Wqkv.weight"]  # (3H, H)
        qs.append(wqkv[:h].T)
        ks_.append(wqkv[h:2 * h].T)
        vs.append(wqkv[2 * h:].T)
    p = "transformer.blocks.{}."
    layers = {
        "input_layernorm": _stack(sd, p + "norm_1.weight", L),
        "post_attention_layernorm": _stack(sd, p + "norm_2.weight", L),
        "q_proj": {"kernel": np.stack(qs).astype(np.float32)},
        "k_proj": {"kernel": np.stack(ks_).astype(np.float32)},
        "v_proj": {"kernel": np.stack(vs).astype(np.float32)},
        "o_proj": {"kernel": _stack(sd, p + "attn.out_proj.weight", L, transpose=True)},
        "up_proj": {"kernel": _stack(sd, p + "ffn.up_proj.weight", L, transpose=True)},
        "down_proj": {"kernel": _stack(sd, p + "ffn.down_proj.weight", L, transpose=True)},
    }
    return {
        "embed_tokens": sd["transformer.wte.weight"].astype(np.float32),
        "layers": layers,
        "norm": sd["transformer.norm_f.weight"].astype(np.float32),
    }


def convert_siglip(sd: Dict[str, np.ndarray], cfg) -> dict:
    """HF SigLIP vision weights -> models/siglip.py param pytree.

    Only the first `cfg.num_used_layers` encoder layers are converted — the
    reference deletes the last layer and bypasses the pooling head
    (siglip_encoder.py:571-572).
    """
    sd = _strip_prefix(
        sd,
        (
            "model.vision_tower.vision_tower.vision_model.",
            "vision_tower.vision_tower.vision_model.",
            "vision_tower.vision_model.",
            "vision_model.",
        ),
    )
    L = cfg.num_used_layers
    p = "encoder.layers.{}."
    layers = {
        "layer_norm1": {
            "weight": _stack(sd, p + "layer_norm1.weight", L),
            "bias": _stack(sd, p + "layer_norm1.bias", L),
        },
        "layer_norm2": {
            "weight": _stack(sd, p + "layer_norm2.weight", L),
            "bias": _stack(sd, p + "layer_norm2.bias", L),
        },
        "q_proj": {
            "kernel": _stack(sd, p + "self_attn.q_proj.weight", L, transpose=True),
            "bias": _stack(sd, p + "self_attn.q_proj.bias", L),
        },
        "k_proj": {
            "kernel": _stack(sd, p + "self_attn.k_proj.weight", L, transpose=True),
            "bias": _stack(sd, p + "self_attn.k_proj.bias", L),
        },
        "v_proj": {
            "kernel": _stack(sd, p + "self_attn.v_proj.weight", L, transpose=True),
            "bias": _stack(sd, p + "self_attn.v_proj.bias", L),
        },
        "out_proj": {
            "kernel": _stack(sd, p + "self_attn.out_proj.weight", L, transpose=True),
            "bias": _stack(sd, p + "self_attn.out_proj.bias", L),
        },
        "fc1": {
            "kernel": _stack(sd, p + "mlp.fc1.weight", L, transpose=True),
            "bias": _stack(sd, p + "mlp.fc1.bias", L),
        },
        "fc2": {
            "kernel": _stack(sd, p + "mlp.fc2.weight", L, transpose=True),
            "bias": _stack(sd, p + "mlp.fc2.bias", L),
        },
    }
    # Conv2d patch embed (out, in, kh, kw) -> (kh, kw, in, out) for lax.conv
    pe = sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0).astype(np.float32)
    return {
        "patch_embedding": {
            "kernel": pe,
            "bias": sd["embeddings.patch_embedding.bias"].astype(np.float32),
        },
        "position_embedding": sd["embeddings.position_embedding.weight"].astype(np.float32),
        "layers": layers,
        "post_layernorm": {
            "weight": sd["post_layernorm.weight"].astype(np.float32),
            "bias": sd["post_layernorm.bias"].astype(np.float32),
        },
    }


def convert_projector(sd: Dict[str, np.ndarray], projector_type: str = "mlp2x_gelu") -> dict:
    """`mm_projector.*` weights -> models/projector.py param pytree."""
    sd = _strip_prefix(sd, ("model.mm_projector.", "mm_projector."))
    m = re.match(r"^mlp(\d+)x_gelu$", projector_type)
    if projector_type == "linear":
        return {"layers": [{"kernel": sd["weight"].T.astype(np.float32),
                            "bias": sd["bias"].astype(np.float32)}]}
    if not m:
        raise ValueError(f"unsupported projector type for import: {projector_type}")
    depth = int(m.group(1))
    layers = []
    for i in range(depth):
        torch_idx = i * 2  # nn.Sequential indices 0, 2, 4, ... (GELU between)
        layers.append({
            "kernel": sd[f"{torch_idx}.weight"].T.astype(np.float32),
            "bias": sd[f"{torch_idx}.bias"].astype(np.float32),
        })
    return {"layers": layers}


def _convert_memory_attention(sd: Dict[str, np.ndarray], prefix: str) -> dict:
    return {
        "q_proj": {"kernel": sd[prefix + "q_proj.weight"].T.astype(np.float32),
                   "bias": sd[prefix + "q_proj.bias"].astype(np.float32)},
        "k_proj": {"kernel": sd[prefix + "k_proj.weight"].T.astype(np.float32),
                   "bias": sd[prefix + "k_proj.bias"].astype(np.float32)},
        "v_proj": {"kernel": sd[prefix + "v_proj.weight"].T.astype(np.float32),
                   "bias": sd[prefix + "v_proj.bias"].astype(np.float32)},
        "residual": {
            "dense": {"kernel": sd[prefix + "residual.dense.weight"].T.astype(np.float32),
                      "bias": sd[prefix + "residual.dense.bias"].astype(np.float32)},
            "layernorm": {"weight": sd[prefix + "residual.layernorm.weight"].astype(np.float32),
                          "bias": sd[prefix + "residual.layernorm.bias"].astype(np.float32)},
        },
    }


def convert_memory_modules(sd: Dict[str, np.ndarray], depth: int = 2) -> dict:
    """Reference memory-module weights -> models/memory.py param pytree.

    Key names follow llava_arch.py:131-150 / MemoryController.py:74-87:
      recurrent_memory_transformer.{initial_memory, memory_pos_embed,
        memory_update_attention.*, layers.N.*}
      memory_fuser.{0,2}.{weight,bias}
      token_type_embedding.weight
      positional_encoding.frame_embed  (buffer; recomputed if absent)
    """
    sd = {re.sub(r"^model\.", "", k): v for k, v in sd.items()}
    rmt = "recurrent_memory_transformer."
    layers = []
    for i in range(depth):
        lp = f"{rmt}layers.{i}."
        layers.append({
            "attention": _convert_memory_attention(sd, lp + "memory_segment_fusion_attention."),
            "mlp": {"kernel": sd[lp + "mlp.0.weight"].T.astype(np.float32),
                    "bias": sd[lp + "mlp.0.bias"].astype(np.float32)},
            "residual": {
                "dense": {"kernel": sd[lp + "residual.dense.weight"].T.astype(np.float32),
                          "bias": sd[lp + "residual.dense.bias"].astype(np.float32)},
                "layernorm": {"weight": sd[lp + "residual.layernorm.weight"].astype(np.float32),
                              "bias": sd[lp + "residual.layernorm.bias"].astype(np.float32)},
            },
        })
    # stack per-depth layers for scan
    stacked = {}

    def stack_tree(trees):
        if isinstance(trees[0], dict):
            return {k: stack_tree([t[k] for t in trees]) for k in trees[0]}
        return np.stack(trees)

    stacked = stack_tree(layers)
    params = {
        "recurrent_memory_transformer": {
            "initial_memory": sd[rmt + "initial_memory"].astype(np.float32),
            "memory_pos_embed": sd[rmt + "memory_pos_embed"].astype(np.float32),
            "memory_update_attention": _convert_memory_attention(
                sd, rmt + "memory_update_attention."),
            "layers": stacked,
        },
        "memory_fuser": {
            "fc1": {"kernel": sd["memory_fuser.0.weight"].T.astype(np.float32),
                    "bias": sd["memory_fuser.0.bias"].astype(np.float32)},
            "fc2": {"kernel": sd["memory_fuser.2.weight"].T.astype(np.float32),
                    "bias": sd["memory_fuser.2.bias"].astype(np.float32)},
        },
        "token_type_embedding": sd["token_type_embedding.weight"].astype(np.float32),
    }
    if "image_newline" in sd:
        params["image_newline"] = sd["image_newline"].astype(np.float32)
    return params
