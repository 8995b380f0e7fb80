"""Golden tests for core ops against PyTorch reference semantics.

The reference relies on torch kernels (F.interpolate bilinear, LayerNorm,
RMSNorm-in-Qwen2, HF RoPE); these tests pin our JAX ops to those numerics at
fp32 (SURVEY.md §7 "bit-faithful parity at fp32").
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from memory_augmented_vlm_tpu.ops.norms import rms_norm, layer_norm
from memory_augmented_vlm_tpu.ops.pooling import (
    bilinear_resize,
    spatial_pool_2x2,
    avg_pool_2d,
    max_pool_2d,
)
from memory_augmented_vlm_tpu.ops.rope import compute_rope_freqs, rope_cos_sin, apply_rope
from memory_augmented_vlm_tpu.ops.attention import mha_attention, decode_attention, repeat_kv

RNG = np.random.default_rng(0)


def test_bilinear_resize_matches_torch_27_to_14():
    x = RNG.standard_normal((3, 27, 27, 5)).astype(np.float32)
    # torch expects NCHW
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(14, 14), mode="bilinear"
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(bilinear_resize(jnp.asarray(x), 14, 14))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [(27, 14), (8, 3), (14, 27), (5, 5), (10, 7)])
def test_bilinear_resize_matches_torch_general(in_size, out_size):
    x = RNG.standard_normal((2, in_size, in_size, 3)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(out_size, out_size), mode="bilinear"
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(bilinear_resize(jnp.asarray(x), out_size, out_size))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_spatial_pool_shapes_and_modes():
    feats = RNG.standard_normal((4, 729, 16)).astype(np.float32)
    out = spatial_pool_2x2(jnp.asarray(feats), 27, mode="bilinear")
    assert out.shape == (4, 196, 16)
    # avg/max on torch for parity
    img = torch.from_numpy(feats).view(4, 27, 27, 16).permute(0, 3, 1, 2)
    ref_avg = F.avg_pool2d(img, 2).permute(0, 2, 3, 1).reshape(4, -1, 16).numpy()
    got_avg = np.asarray(spatial_pool_2x2(jnp.asarray(feats), 27, mode="average"))
    np.testing.assert_allclose(got_avg, ref_avg, rtol=1e-6, atol=1e-6)
    ref_max = F.max_pool2d(img, 2).permute(0, 2, 3, 1).reshape(4, -1, 16).numpy()
    got_max = np.asarray(spatial_pool_2x2(jnp.asarray(feats), 27, mode="max"))
    np.testing.assert_allclose(got_max, ref_max, rtol=1e-6, atol=1e-6)


def test_rms_norm_matches_qwen2():
    x = RNG.standard_normal((2, 7, 64)).astype(np.float32)
    w = RNG.standard_normal((64,)).astype(np.float32)
    xt = torch.from_numpy(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    ref = (xt * torch.rsqrt(var + 1e-6) * torch.from_numpy(w)).numpy()
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    x = RNG.standard_normal((3, 5, 32)).astype(np.float32)
    w = RNG.standard_normal((32,)).astype(np.float32)
    b = RNG.standard_normal((32,)).astype(np.float32)
    ref = F.layer_norm(
        torch.from_numpy(x), (32,), torch.from_numpy(w), torch.from_numpy(b), eps=1e-12
    ).numpy()
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1e-12))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_rope_matches_hf_convention():
    # Reference: HF Qwen2 rotary — concat layout + rotate_half
    head_dim, theta, seq = 64, 1000000.0, 11
    inv = compute_rope_freqs(head_dim, theta)
    inv_t = 1.0 / (theta ** (torch.arange(0, head_dim, 2, dtype=torch.float32) / head_dim))
    np.testing.assert_allclose(np.asarray(inv), inv_t.numpy(), rtol=1e-5)

    pos = np.arange(seq, dtype=np.int32)
    cos, sin = rope_cos_sin(jnp.asarray(pos), inv)
    freqs = torch.outer(torch.arange(seq, dtype=torch.float32), inv_t)
    emb = torch.cat([freqs, freqs], dim=-1)
    np.testing.assert_allclose(np.asarray(cos), emb.cos().numpy(), rtol=1e-4, atol=5e-5)

    q = RNG.standard_normal((1, seq, 4, head_dim)).astype(np.float32)
    got = np.asarray(apply_rope(jnp.asarray(q), cos[None], sin[None]))

    qt = torch.from_numpy(q).permute(0, 2, 1, 3)  # (B, H, S, D) like HF
    cos_t, sin_t = emb.cos()[None, None], emb.sin()[None, None]

    def rotate_half(t):
        h = t.shape[-1] // 2
        return torch.cat([-t[..., h:], t[..., :h]], dim=-1)

    ref = (qt * cos_t + rotate_half(qt) * sin_t).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_mha_attention_matches_torch_sdpa():
    b, sq, sk, h, d = 2, 5, 9, 3, 16
    q = RNG.standard_normal((b, sq, h, d)).astype(np.float32)
    k = RNG.standard_normal((b, sk, h, d)).astype(np.float32)
    v = RNG.standard_normal((b, sk, h, d)).astype(np.float32)
    ref = F.scaled_dot_product_attention(
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(k).permute(0, 2, 1, 3),
        torch.from_numpy(v).permute(0, 2, 1, 3),
    ).permute(0, 2, 1, 3).numpy()
    got = np.asarray(mha_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_mha_attention_causal():
    b, s, h, d = 1, 6, 2, 8
    q = RNG.standard_normal((b, s, h, d)).astype(np.float32)
    ref = F.scaled_dot_product_attention(
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(q).permute(0, 2, 1, 3),
        is_causal=True,
    ).permute(0, 2, 1, 3).numpy()
    got = np.asarray(mha_attention(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), causal=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_decode_attention_matches_full_attention():
    b, smax, h, hkv, d = 2, 12, 4, 2, 8
    lens = np.array([5, 12], dtype=np.int32)
    q = RNG.standard_normal((b, 1, h, d)).astype(np.float32)
    kc = RNG.standard_normal((b, smax, hkv, d)).astype(np.float32)
    vc = RNG.standard_normal((b, smax, hkv, d)).astype(np.float32)
    got = np.asarray(
        decode_attention(jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
                         jnp.asarray(lens), kv_groups=h // hkv)
    )
    for i in range(b):
        L = lens[i]
        kk = np.asarray(repeat_kv(jnp.asarray(kc[i : i + 1, :L]), h // hkv))
        vv = np.asarray(repeat_kv(jnp.asarray(vc[i : i + 1, :L]), h // hkv))
        ref = np.asarray(mha_attention(jnp.asarray(q[i : i + 1]), jnp.asarray(kk), jnp.asarray(vv)))
        np.testing.assert_allclose(got[i], ref[0], rtol=1e-5, atol=1e-5)


def test_repeat_kv_matches_hf_order():
    x = RNG.standard_normal((1, 3, 2, 4)).astype(np.float32)
    got = np.asarray(repeat_kv(jnp.asarray(x), 3))
    xt = torch.from_numpy(x).permute(0, 2, 1, 3)  # (B, Hkv, S, D)
    ref = xt[:, :, None].expand(1, 2, 3, 3, 4).reshape(1, 6, 3, 4).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(got, ref)
