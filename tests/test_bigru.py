"""BiGRU temporal encoder + alternate TransformerEncoder memory fuser:
bit-parity against the reference torch modules loaded from the reference
tree (bigru.py TemporalGRUEncoder, MemoryFuser.py MemoryFuser)."""

import importlib.util
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from memory_augmented_vlm_tpu.models import bigru, memory_fuser


def _load(path, name):
    if not os.path.exists(path):
        pytest.skip("reference repo not present")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bigru_matches_torch_gru():
    mod = _load("/root/reference/llava/model/memory_module/bigru.py", "ref_bigru")
    torch.manual_seed(0)
    enc = mod.TemporalGRUEncoder(input_dim=24, hidden_size=12).eval().float()
    params = bigru.convert_torch(
        {k: v.numpy() for k, v in enc.state_dict().items()})

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((6, 5, 24)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(feats)).numpy()
    got = np.asarray(bigru.forward(params, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bigru_init_and_shapes():
    import jax

    params = bigru.init_params(16, 8, jax.random.key(0))
    out = bigru.forward(params, jnp.ones((4, 3, 16)))
    assert out.shape == (4, 3, 16)


def test_memory_fuser_matches_torch_transformer_encoder():
    mod = _load("/root/reference/llava/model/memory_module/MemoryFuser.py",
                "ref_fuser")
    torch.manual_seed(1)
    fuser = mod.MemoryFuser(hidden_dim=16, num_layers=2, num_heads=4,
                            dropout=0.0, device="cpu").eval().float()
    params = memory_fuser.convert_torch(
        {k: v.numpy() for k, v in fuser.state_dict().items()})

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 7, 16)).astype(np.float32)
    with torch.no_grad():
        want = fuser(torch.from_numpy(x)).numpy()
    got = np.asarray(memory_fuser.forward(params, jnp.asarray(x), num_heads=4))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
