"""Pallas flash-attention kernel vs the XLA reference (interpret mode on CPU,
true-fp32 matmuls -> tight tolerance)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from memory_augmented_vlm_tpu.ops.attention import mha_attention
from memory_augmented_vlm_tpu.ops.pallas_flash import pallas_flash_attention

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("s,vl,causal", [
    (256, (256, 256), True),
    (256, (100, 256), True),
    (512, (300, 511), True),
    (256, (256, 200), False),
])
def test_kernel_matches_reference(s, vl, causal):
    b, h, d = 2, 3, 64
    q = jnp.asarray(RNG.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((b, s, h, d)), jnp.float32)
    valid = jnp.asarray(vl, jnp.int32)
    out = pallas_flash_attention(
        q, k, v, causal=causal, kv_valid_len=valid,
        block_q=128, block_k=128, interpret=True,
    )
    mask = jnp.arange(s)[None, None, None, :] < valid[:, None, None, None]
    ref = mha_attention(q, k, v, mask=mask, causal=causal)
    for i in range(b):
        n = int(valid[i])
        np.testing.assert_allclose(
            np.asarray(out[i, :n]), np.asarray(ref[i, :n]), rtol=1e-5, atol=1e-5
        )


def test_kernel_pads_non_multiple_sequence():
    b, s, h, d = 1, 300, 2, 64
    q = jnp.asarray(RNG.standard_normal((b, s, h, d)), jnp.float32)
    out = pallas_flash_attention(
        q, q, q, causal=True, block_q=128, block_k=128, interpret=True
    )
    ref = mha_attention(q, q, q, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_memory_attention_flash_path_semantics(monkeypatch):
    """Force the memory cross-attention flash dispatch (with head-dim padding)
    through the interpreted kernel on CPU and pin it to the XLA path."""
    import jax
    import memory_augmented_vlm_tpu.models.memory as jmem
    from memory_augmented_vlm_tpu.config import MemoryConfig
    from memory_augmented_vlm_tpu.ops import pallas_flash

    cfg = MemoryConfig(hidden_size=64, num_attention_heads=4, patch_size=4,
                       num_memory_tokens=2)
    params = jmem.init_params(cfg, jax.random.key(0))
    p = params["memory_update_attention"]
    rng = np.random.default_rng(5)
    q_in = jnp.asarray(rng.standard_normal((1, 128, 64)), jnp.float32)
    kv_in = jnp.asarray(rng.standard_normal((1, 256, 64)), jnp.float32)
    vl = jnp.asarray([200], jnp.int32)

    ref = jmem.attention(p, cfg, q_in, kv_in,
                         kv_mask=(jnp.arange(256) < 200)[None])

    monkeypatch.setattr(jmem.jax, "default_backend", lambda: "tpu")
    orig = pallas_flash_attention

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pallas_flash, "pallas_flash_attention", interp)
    got = jmem.attention(p, cfg, q_in, kv_in, kv_valid_len=vl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_flash_gradients_match_reference():
    """custom_vjp backward (XLA recompute) vs autodiff through reference math
    — this is the path the trainable memory fuser differentiates on TPU."""
    rng = np.random.default_rng(7)
    b, sq, skv, h, d = 2, 128, 256, 2, 128
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)), jnp.float32)
    vl = jnp.asarray([200, 256], jnp.int32)
    g = jnp.asarray(rng.standard_normal((b, sq, h, d)), jnp.float32)

    def loss_flash(q, k, v):
        out = pallas_flash_attention(
            q, k, v, causal=False, kv_valid_len=vl, interpret=True,
            block_q=128, block_k=128)
        return jnp.vdot(out, g)

    def loss_ref(q, k, v):
        mask = jnp.arange(skv)[None, None, None, :] < vl[:, None, None, None]
        return jnp.vdot(
            mha_attention(q, k, v, mask=mask, causal=False), g)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_bhsd_layout_matches_bshd():
    """layout="bhsd" (head-major in/out, no boundary transposes) must equal
    the default layout on the same inputs."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from memory_augmented_vlm_tpu.ops.pallas_flash import pallas_flash_attention

    rng = np.random.default_rng(0)
    B, S, H, D = 2, 200, 4, 64
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    vl = jnp.asarray([200, 150], jnp.int32)
    ref = pallas_flash_attention(q, k, v, causal=False, kv_valid_len=vl,
                                 block_q=128, block_k=128, interpret=True)
    got = pallas_flash_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), causal=False, kv_valid_len=vl,
        block_q=128, block_k=128, interpret=True, layout="bhsd")
    np.testing.assert_allclose(np.asarray(got.transpose(0, 2, 1, 3)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_merge_heads_and_out_proj_kernels_match_composed():
    """flash_attention_merge_heads == transpose+reshape of bhsd attention;
    flash_attention_out_proj_int8 == merge_heads + int8_linear + residual."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from memory_augmented_vlm_tpu.ops.pallas_flash import (
        flash_attention_merge_heads,
        flash_attention_out_proj_int8,
        pallas_flash_attention,
    )
    from memory_augmented_vlm_tpu.ops.quant import int8_linear, prequantize_kernel

    rng = np.random.default_rng(1)
    B, NH, S, D = 2, 4, 256, 64
    H = NH * D
    mk = lambda: jnp.asarray(rng.standard_normal((B, NH, S, D)), jnp.bfloat16)  # noqa: E731
    q, k, v = mk(), mk(), mk()
    vl = jnp.asarray([256, 200], jnp.int32)
    merged = flash_attention_merge_heads(q, k, v, vl, interpret=True)
    ref = pallas_flash_attention(q, k, v, causal=False, kv_valid_len=vl,
                                 block_q=128, block_k=256, interpret=True,
                                 layout="bhsd")
    ref_merged = ref.transpose(0, 2, 1, 3).reshape(B, S, H)
    np.testing.assert_allclose(
        np.asarray(merged, np.float32), np.asarray(ref_merged, np.float32),
        rtol=2e-2, atol=2e-2)

    wo, so = prequantize_kernel(
        jnp.asarray(rng.standard_normal((H, H)) * 0.05, jnp.float32))
    bo = jnp.asarray(rng.standard_normal(H) * 0.01, jnp.float32)
    hid = jnp.asarray(rng.standard_normal((B, S, H)), jnp.bfloat16)
    got = flash_attention_out_proj_int8(q, k, v, vl, hid, wo, so, bo,
                                        interpret=True)
    want = hid + int8_linear(
        {"kernel_int8": wo, "scale": so, "bias": bo}, merged).astype(hid.dtype)
    rel = (np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32)).std()
           / np.asarray(want, np.float32).std())
    assert rel < 2e-2, rel


def test_merge_heads_int8_scores_close_to_bf16_path():
    """int8_scores (per-tile scalar quant, both matmuls on the int8 MXU)
    stays within the int8-tower drift class of the exact path."""
    import numpy as np
    import jax.numpy as jnp

    from memory_augmented_vlm_tpu.ops.pallas_flash import (
        flash_attention_merge_heads,
    )

    rng = np.random.default_rng(3)
    B, NH, S, D = 2, 4, 256, 64
    mk = lambda: jnp.asarray(rng.standard_normal((B, NH, S, D)), jnp.bfloat16)  # noqa: E731
    q, k, v = mk(), mk(), mk()
    vl = jnp.asarray([256, 200], jnp.int32)
    exact = np.asarray(
        flash_attention_merge_heads(q, k, v, vl, interpret=True), np.float32)
    got = np.asarray(
        flash_attention_merge_heads(q, k, v, vl, int8_scores=True,
                                    interpret=True), np.float32)
    rel = np.abs(got - exact).std() / exact.std()
    assert rel < 0.03, rel
    # pad keys must still be fully masked (row 1 has 56 invalid keys)
    corr = np.corrcoef(got.ravel(), exact.ravel())[0, 1]
    assert corr > 0.999, corr
