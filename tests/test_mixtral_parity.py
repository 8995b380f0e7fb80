"""Mixtral MoE decoder parity vs HF transformers (fp32).

The reference ships llava_mixtral ACTIVE in its registry
(/root/reference/llava/model/__init__.py:7,
llava/model/language_model/llava_mixtral.py:1-143) on the stock HF
MixtralForCausalLM. Here the sparse-MoE MLP runs as a dense-dispatch einsum
over stacked expert kernels (models/qwen2.py::_moe_mlp) — parity pins the
fp32 router softmax, top-2 renormalization, and SwiGLU expert math.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.checkpoint.hf_import import (
    convert_mixtral,
    torch_state_dict_to_numpy,
)
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.models.registry import AVAILABLE_MODELS, lm_config_for


@pytest.fixture(scope="module")
def tiny_mixtral():
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    hf_cfg = MixtralConfig(
        vocab_size=503,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    hf = MixtralForCausalLM(hf_cfg).float().eval()
    cfg = lm_config_for("llava_mixtral", hf_cfg.to_dict())
    params = jax.tree.map(
        jnp.asarray,
        convert_mixtral(torch_state_dict_to_numpy(hf.state_dict()), cfg),
    )
    return hf, cfg, params


def test_registry_accepts_mixtral():
    assert AVAILABLE_MODELS["llava_mixtral"] == "supported"
    cfg = lm_config_for("llava_mixtral", {"num_local_experts": 8})
    assert cfg.num_local_experts == 8 and cfg.num_experts_per_tok == 2
    assert cfg.attention_bias is False


def test_mixtral_logits_match_hf(tiny_mixtral):
    hf, cfg, params = tiny_mixtral
    ids = np.array([[3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids, jnp.int32), cfg)
    hidden, _ = qwen2.forward(
        params, cfg, embeds, jnp.arange(ids.shape[1])[None],
        force_reference_attention=True,
    )
    got = np.asarray(qwen2.unembed(params, cfg, hidden))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_mixtral_decode_matches_prefill(tiny_mixtral):
    """Greedy decode through the KV cache must agree with re-prefilling."""
    _, cfg, params = tiny_mixtral
    ids = np.array([[7, 8, 9, 10]], np.int64)
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids, jnp.int32), cfg)
    hidden, cache = qwen2.forward(
        params, cfg, embeds, jnp.arange(4)[None], cache_max_len=8,
        force_reference_attention=True,
    )
    tok = int(jnp.argmax(qwen2.unembed(params, cfg, hidden[:, -1:])))
    toks = [tok]
    for _ in range(3):
        emb = qwen2.embed_tokens(params, jnp.asarray([[toks[-1]]], jnp.int32), cfg)
        hidden, cache = qwen2.decode_step(params, cfg, emb, cache)
        toks.append(int(jnp.argmax(qwen2.unembed(params, cfg, hidden))))

    # oracle: prefill the whole extended sequence each step
    full = list(ids[0])
    oracle = []
    for _ in range(4):
        emb = qwen2.embed_tokens(params, jnp.asarray([full], jnp.int32), cfg)
        hidden, _ = qwen2.forward(
            params, cfg, emb, jnp.arange(len(full))[None],
            force_reference_attention=True,
        )
        nxt = int(jnp.argmax(qwen2.unembed(params, cfg, hidden[:, -1:])))
        oracle.append(nxt)
        full.append(nxt)
    assert toks == oracle


@pytest.mark.parametrize("mesh_kw", [
    dict(data=2, fsdp=2, tp=2),          # experts split over fsdp
    dict(data=2, fsdp=1, tp=2, ep=2),    # dedicated expert-parallel axis
], ids=["fsdp", "ep"])
def test_mixtral_sharded_on_mesh(tiny_mixtral, mesh_kw):
    """Expert kernels place on the mesh (expert axis over (fsdp, ep)) and
    the sharded forward matches single-device."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from memory_augmented_vlm_tpu.config import MeshConfig
    from memory_augmented_vlm_tpu.parallel.mesh import build_mesh
    from memory_augmented_vlm_tpu.parallel.sharding import (
        lm_param_pspecs,
        sanitize_pspecs,
    )

    _, cfg, params = tiny_mixtral
    mesh = build_mesh(MeshConfig(**mesh_kw))
    pspecs = sanitize_pspecs(lm_param_pspecs(params), params, mesh)
    assert pspecs["layers"]["experts"]["gate_proj"]["kernel"] == P(
        "pp", ("fsdp", "ep"), None, "tp")  # pp is size-1 here (layer axis)
    if mesh_kw.get("ep", 1) > 1:
        # the expert axis really splits across the ep ranks
        k = jax.device_put(
            params["layers"]["experts"]["gate_proj"]["kernel"],
            NamedSharding(mesh,
                          pspecs["layers"]["experts"]["gate_proj"]["kernel"]))
        shard_e = k.addressable_shards[0].data.shape[1]
        assert shard_e == k.shape[1] // 2
    sharded = jax.device_put(
        params, jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P)))

    ids = np.array([[3, 1, 4, 1], [5, 9, 2, 6], [5, 3, 5, 8], [9, 7, 9, 3]],
                   np.int64)

    def fwd(p, i):
        embeds = qwen2.embed_tokens(p, i, cfg)
        hidden, _ = qwen2.forward(p, cfg, embeds,
                                  jnp.broadcast_to(jnp.arange(4)[None], i.shape),
                                  force_reference_attention=True)
        return qwen2.unembed(p, cfg, hidden)

    ref = np.asarray(fwd(params, jnp.asarray(ids, jnp.int32)))
    with jax.set_mesh(mesh):
        ids_sh = jax.device_put(jnp.asarray(ids, jnp.int32),
                                NamedSharding(mesh, P(("data", "fsdp"))))
        got = np.asarray(jax.jit(fwd)(sharded, ids_sh))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
