"""MLCD RoPE-2D tower parity vs HF transformers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from memory_augmented_vlm_tpu.checkpoint.hf_import import torch_state_dict_to_numpy
from memory_augmented_vlm_tpu.models import mlcd


def test_mlcd_matches_hf():
    from transformers import MLCDVisionConfig, MLCDVisionModel

    torch.manual_seed(0)
    hf_cfg = MLCDVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, image_size=56, patch_size=14,
        attn_implementation="eager",
    )
    hf = MLCDVisionModel(hf_cfg).eval().float()
    cfg = mlcd.MLCDVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, image_size=56, patch_size=14,
    )
    params = jax.tree.map(
        jnp.asarray, mlcd.convert_hf(torch_state_dict_to_numpy(hf.state_dict()), cfg))

    rng = np.random.default_rng(0)
    px = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(px).permute(0, 3, 1, 2), output_hidden_states=True)
    ref = out.hidden_states[-2][:, 1:].numpy()
    got = np.asarray(mlcd.forward(params, cfg, jnp.asarray(px)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
