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
