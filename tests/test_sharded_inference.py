"""Multi-device INFERENCE: generate with fsdp/tp-sharded params on the
8-device mesh must produce bit-identical greedy tokens to the single-device
path (the capability the reference reaches via HF device_map=auto layer
sharding — here GSPMD propagates the NamedShardings through the jitted
prefill + decode while_loop, covering 7B-class models on v5e-8)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import LMConfig, MeshConfig, VLMConfig
from memory_augmented_vlm_tpu.models import qwen2, vlm
from memory_augmented_vlm_tpu.parallel.mesh import build_mesh
from memory_augmented_vlm_tpu.parallel.sharding import shard_params


@pytest.fixture(scope="module")
def tiny():
    lm = LMConfig(vocab_size=50048, hidden_size=64, intermediate_size=128,
                  num_hidden_layers=2, num_attention_heads=8,
                  num_key_value_heads=4, head_dim=8, rope_theta=10000.0,
                  dtype="float32")
    cfg = VLMConfig(lm=lm)
    params = {"language_model": qwen2.init_params(lm, jax.random.key(0))}
    return cfg, params


def test_sharded_generate_matches_single_device(tiny):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg, params = tiny
    ids = np.array([5, 9, 23, 7])
    emb = qwen2.embed_tokens(params["language_model"],
                             jnp.asarray(ids, jnp.int32))
    ref = vlm.generate(params, cfg, emb, max_new_tokens=6,
                       eos_token_ids=(50000,), pad_to_multiple=8)
    want = np.asarray(ref.tokens)[: int(ref.num_tokens)]

    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tp=2))
    with mesh:
        sharded = shard_params(params, mesh)
        vlm._jit_generate.cache_clear()  # retrace under the mesh
        out = vlm.generate(sharded, cfg, emb, max_new_tokens=6,
                           eos_token_ids=(50000,), pad_to_multiple=8)
        got = np.asarray(out.tokens)[: int(out.num_tokens)]
    vlm._jit_generate.cache_clear()
    np.testing.assert_array_equal(got, want)


def test_sharded_scoring_matches_single_device(tiny):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg, params = tiny
    ids = np.array([5, 9, 23, 7, 11])
    emb = qwen2.embed_tokens(params["language_model"],
                             jnp.asarray(ids, jnp.int32))
    ll_ref, greedy_ref = vlm.score_continuation(params, cfg, emb,
                                                np.array([7, 11]))
    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tp=2))
    with mesh:
        sharded = shard_params(params, mesh)
        vlm._jit_score.cache_clear()
        ll, greedy = vlm.score_continuation(sharded, cfg, emb,
                                            np.array([7, 11]))
    vlm._jit_score.cache_clear()
    assert greedy == greedy_ref
    np.testing.assert_allclose(ll, ll_ref, rtol=1e-4, atol=1e-4)
