"""Pallas int8 matmul kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.pallas_int8 import (
    int8_matmul,
    int8_matmul_reference,
    quantize_weight,
)


def test_kernel_matches_oracle_interpret():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((100, 64)), jnp.float32)
    w = rng.standard_normal((64, 200)).astype(np.float32) * 0.1
    wq, sw = quantize_weight(w)
    out = int8_matmul(x, wq, sw, block_m=32, block_n=128, interpret=True)
    ref = int8_matmul_reference(x, wq, sw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_quantization_error_bounded():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((50, 64)), jnp.float32)
    w = rng.standard_normal((64, 80)).astype(np.float32) * 0.05
    wq, sw = quantize_weight(w)
    qout = int8_matmul_reference(x, wq, sw)
    fout = np.asarray(x) @ w
    rel = np.abs(np.asarray(qout) - fout).mean() / np.abs(fout).mean()
    assert rel < 0.02, rel


def test_weight_quantization_roundtrip():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    wq, sw = quantize_weight(w)
    assert wq.dtype == jnp.int8 and sw.shape == (16,)
    recon = np.asarray(wq, np.float32) * np.asarray(sw)[None, :]
    assert np.abs(recon - w).max() <= np.asarray(sw).max() * 0.5 + 1e-6


def test_fused_mlp_matches_oracle_interpret():
    from memory_augmented_vlm_tpu.ops.pallas_mlp_int8 import (
        fused_mlp_int8,
        fused_mlp_int8_reference,
    )

    rng = np.random.default_rng(3)
    m, k, i = 100, 64, 128
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w1 = rng.standard_normal((k, i)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((i, k)).astype(np.float32) * 0.1
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    b1 = jnp.asarray(rng.standard_normal(i) * 0.01, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(k) * 0.01, jnp.float32)
    out = fused_mlp_int8(x, w1q, s1, b1, w2q, s2, b2, block_m=32,
                         interpret=True)
    ref = fused_mlp_int8_reference(x, w1q, s1, b1, w2q, s2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_mlp_close_to_float():
    """Double int8 quantization drift stays in the same class as two
    independent int8 matmuls."""
    from memory_augmented_vlm_tpu.ops.pallas_mlp_int8 import (
        fused_mlp_int8_reference,
    )

    rng = np.random.default_rng(4)
    m, k, i = 64, 48, 96
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.5, jnp.float32)
    w1 = rng.standard_normal((k, i)).astype(np.float32) * 0.05
    w2 = rng.standard_normal((i, k)).astype(np.float32) * 0.05
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    b1 = np.zeros(i, np.float32)
    b2 = np.zeros(k, np.float32)
    got = np.asarray(fused_mlp_int8_reference(
        x, w1q, s1, jnp.asarray(b1), w2q, s2, jnp.asarray(b2)))
    h = jax.nn.gelu(np.asarray(x) @ w1, approximate=True)
    want = np.asarray(h) @ w2
    rel = np.abs(got - want).mean() / np.abs(want).mean()
    assert rel < 0.05, rel


def test_fused_mlp_block_matches_oracle_interpret():
    from memory_augmented_vlm_tpu.ops.pallas_mlp_int8 import (
        fused_mlp_block_int8,
        fused_mlp_block_int8_reference,
    )

    rng = np.random.default_rng(5)
    m, k, i = 72, 64, 128
    hidden = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    w1 = rng.standard_normal((k, i)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((i, k)).astype(np.float32) * 0.1
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    b1 = jnp.asarray(rng.standard_normal(i) * 0.01, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(k) * 0.01, jnp.float32)
    lnw = jnp.asarray(1.0 + rng.standard_normal(k) * 0.05, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(k) * 0.02, jnp.float32)
    out = fused_mlp_block_int8(hidden, lnw, lnb, w1q, s1, b1, w2q, s2, b2,
                               block_m=32, interpret=True)
    ref = fused_mlp_block_int8_reference(hidden, lnw, lnb, w1q, s1, b1,
                                         w2q, s2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_swiglu_block_matches_oracle_interpret():
    from memory_augmented_vlm_tpu.ops.pallas_mlp_int8 import (
        fused_swiglu_block_int8,
        fused_swiglu_block_int8_reference,
    )

    rng = np.random.default_rng(6)
    m, k, i = 72, 64, 128
    hidden = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    wg = rng.standard_normal((k, i)).astype(np.float32) * 0.1
    wu = rng.standard_normal((k, i)).astype(np.float32) * 0.1
    wd = rng.standard_normal((i, k)).astype(np.float32) * 0.1
    wgq, sg = quantize_weight(wg)
    wuq, su = quantize_weight(wu)
    wdq, sd = quantize_weight(wd)
    rmsw = jnp.asarray(1.0 + rng.standard_normal(k) * 0.05, jnp.float32)
    out = fused_swiglu_block_int8(hidden, rmsw, wgq, sg, wuq, su, wdq, sd,
                                  block_m=32, interpret=True)
    ref = fused_swiglu_block_int8_reference(hidden, rmsw, wgq, sg, wuq, su,
                                            wdq, sd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_swiglu_block_matches_composed_lm_half():
    """The kernel's math == RMSNorm -> int8_linear gate/up -> silu-gate ->
    int8_linear down -> residual (the exact XLA fallback in
    qwen2._mlp_half), within int8-requant tolerance."""
    from memory_augmented_vlm_tpu.ops.norms import rms_norm
    from memory_augmented_vlm_tpu.ops.pallas_mlp_int8 import (
        fused_swiglu_block_int8_reference,
    )
    from memory_augmented_vlm_tpu.ops.quant import int8_linear

    rng = np.random.default_rng(7)
    m, k, i = 48, 64, 96
    hidden = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    wg = rng.standard_normal((k, i)).astype(np.float32) * 0.1
    wu = rng.standard_normal((k, i)).astype(np.float32) * 0.1
    wd = rng.standard_normal((i, k)).astype(np.float32) * 0.1
    wgq, sg = quantize_weight(wg)
    wuq, su = quantize_weight(wu)
    wdq, sd = quantize_weight(wd)
    rmsw = jnp.asarray(1.0 + rng.standard_normal(k) * 0.05, jnp.float32)
    got = fused_swiglu_block_int8_reference(
        hidden, rmsw, wgq, sg, wuq, su, wdq, sd)
    x = rms_norm(hidden, rmsw)
    g = int8_linear({"kernel_int8": wgq, "scale": sg}, x)
    u = int8_linear({"kernel_int8": wuq, "scale": su}, x)
    h = jax.nn.silu(g) * u
    d = int8_linear({"kernel_int8": wdq, "scale": sd}, h)
    want = hidden + d
    rel = (np.abs(np.asarray(got) - np.asarray(want)).std()
           / np.asarray(want).std())
    assert rel < 2e-2, rel
