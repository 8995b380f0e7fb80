"""SigLIP tower + projector parity vs HF transformers at fp32.

The reference tower output equals the full model's hidden_states[-2]
(pre-post_layernorm output of the second-to-last layer) — pinned here on a
tiny random SigLIP (same architecture family, smaller dims).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from memory_augmented_vlm_tpu.config import VisionConfig
from memory_augmented_vlm_tpu.checkpoint.hf_import import (
    convert_projector,
    convert_siglip,
    torch_state_dict_to_numpy,
)
from memory_augmented_vlm_tpu.models import projector, siglip


@pytest.fixture(scope="module")
def tiny_siglip():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(0)
    hf_cfg = SiglipVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        attn_implementation="eager",
    )
    hf_model = SiglipVisionModel(hf_cfg).eval().float()
    cfg = VisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
    )
    sd = torch_state_dict_to_numpy(hf_model.state_dict())
    params = jax.tree.map(jnp.asarray, convert_siglip(sd, cfg))
    return hf_model, cfg, params


def test_tower_matches_hf_hidden_states_minus_2(tiny_siglip):
    hf_model, cfg, params = tiny_siglip
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf_model(
            torch.from_numpy(pixels).permute(0, 3, 1, 2), output_hidden_states=True
        )
    ref = out.hidden_states[-2].numpy()  # == trimmed tower's last hidden state
    got = np.asarray(siglip.forward(params, cfg, jnp.asarray(pixels)))
    assert got.shape == (2, cfg.num_patches, cfg.hidden_size)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_projector_mlp2x_gelu_matches_torch():
    torch.manual_seed(1)
    lin1 = torch.nn.Linear(16, 24)
    lin2 = torch.nn.Linear(24, 24)
    seq = torch.nn.Sequential(lin1, torch.nn.GELU(), lin2).eval()
    sd = torch_state_dict_to_numpy(seq.state_dict())
    params = jax.tree.map(jnp.asarray, convert_projector(sd, "mlp2x_gelu"))
    x = np.random.default_rng(2).standard_normal((3, 5, 16)).astype(np.float32)
    with torch.no_grad():
        ref = seq(torch.from_numpy(x)).numpy()
    got = np.asarray(projector.forward(params, "mlp2x_gelu", jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_image_processor_matches_reference_semantics():
    """preprocess: RGB -> bicubic 384^2 -> /255 -> (x-0.5)/0.5, channel-last."""
    from PIL import Image

    from memory_augmented_vlm_tpu.data.preprocessing import SigLipImageProcessor

    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, size=(100, 160, 3), dtype=np.uint8)
    img = Image.fromarray(raw)
    got = SigLipImageProcessor().preprocess(img)
    assert got.shape == (1, 384, 384, 3)
    ref = np.asarray(img.resize((384, 384), Image.BICUBIC), dtype=np.float32)
    ref = (ref / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(got[0], ref, rtol=1e-6, atol=1e-6)
    assert got.min() >= -1.0 - 1e-6 and got.max() <= 1.0 + 1e-6


def test_tower_flash_padded_stream_matches_xla_path(tiny_siglip):
    """The TPU flash path pads the whole residual stream to the lane multiple
    once (729->768 at full size; 16->128 here) and masks attention back to
    the true patch count via kv_valid_len. Interpret mode pins that the
    first s0 rows are (tolerance-)identical to the unpadded XLA path."""
    _, cfg, params = tiny_siglip
    rng = np.random.default_rng(1)
    pixels = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), jnp.float32)
    ref = np.asarray(siglip.forward(params, cfg, pixels, use_flash=False))
    got = np.asarray(
        siglip.forward(params, cfg, pixels, use_flash=True, _interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_tower_fused_qkv_int8_matches_composed_int8(tiny_siglip):
    """fused_qkv_int8 (LN + row-quant + int8 QKV, head-major out) + bhsd
    flash must reproduce the composed int8 path: same quant math, so the
    only divergence is flash-vs-eager softmax order (fp32 both ways)."""
    _, cfg, params = tiny_siglip
    qparams = siglip.prequantize_int8(params)
    rng = np.random.default_rng(2)
    pixels = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), jnp.float32)
    ref = np.asarray(siglip.forward(qparams, cfg, pixels, int8=True,
                                    use_flash=False))
    for oproj in (False, True):
        got = np.asarray(siglip.forward(qparams, cfg, pixels, int8=True,
                                        fused_qkv=True, fused_oproj=oproj,
                                        use_flash=True, _interpret=True))
        assert got.shape == ref.shape
        # q/k/v leave the fused kernel as bf16 (the composed path keeps f32
        # here), so drift sits in the bf16-activation class, same as the TPU
        # parity bound (CLAUDE.md numerics rules)
        rel = np.abs(got - ref).std() / ref.std()
        assert rel < 2e-2, (oproj, rel)
