"""Oracle-pinned tests for the experimental fused attention half-block
kernel (ops/pallas_attn_block.py) in interpret mode.

The kernel is not wired into the tower (measured slower than the composed
flash + XLA path at hd=72 — see the module docstring); these tests pin its
correctness so the experiment stays reusable.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from memory_augmented_vlm_tpu.ops.pallas_attn_block import (
    fused_attn_block_int8, fused_attn_block_int8_reference)


def _setup(b=2, s=128, h=256, seed=0):
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.standard_normal((b, s, h)) * 0.3, jnp.float32)
    ln_w = jnp.asarray(1 + 0.1 * rng.standard_normal(h), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.standard_normal(h), jnp.float32)

    def wtrip():
        w = rng.integers(-127, 128, (h, h)).astype(np.int8)
        sc = (np.abs(rng.standard_normal(h)) * 0.02 / 127).astype(np.float32)
        bias = (rng.standard_normal(h) * 0.01).astype(np.float32)
        return jnp.asarray(w), jnp.asarray(sc), jnp.asarray(bias)

    weights = sum([list(wtrip()) for _ in range(4)], [])
    return hidden, ln_w, ln_b, weights


@pytest.mark.parametrize("block_r,valid", [(64, 100), (128, 128), (32, 97)])
def test_kernel_matches_oracle(block_r, valid):
    hidden, ln_w, ln_b, W = _setup()
    nh = 4
    out = fused_attn_block_int8(
        hidden, ln_w, ln_b, *W, nh=nh, valid=valid, block_r=block_r,
        interpret=True)
    ref = fused_attn_block_int8_reference(
        hidden, ln_w, ln_b, *W, nh=nh, valid=valid)
    o = np.asarray(out[:, :valid], np.float32)
    r = np.asarray(ref[:, :valid], np.float32)
    assert np.isfinite(o).all()
    rel = np.abs(o - r).mean() / (np.abs(r).mean() + 1e-9)
    assert rel < 5e-3, rel


def test_padded_rows_stay_finite():
    hidden, ln_w, ln_b, W = _setup()
    hidden = hidden.at[:, 100:].set(0.0)  # padded tail rows
    out = fused_attn_block_int8(
        hidden, ln_w, ln_b, *W, nh=4, valid=100, block_r=64, interpret=True)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_head_count_variants():
    hidden, ln_w, ln_b, W = _setup(h=256)
    for nh in (2, 8):
        out = fused_attn_block_int8(
            hidden, ln_w, ln_b, *W, nh=nh, valid=128, block_r=64,
            interpret=True)
        ref = fused_attn_block_int8_reference(
            hidden, ln_w, ln_b, *W, nh=nh, valid=128)
        rel = (np.abs(np.asarray(out - ref, np.float32)).mean()
               / (np.abs(np.asarray(ref, np.float32)).mean() + 1e-9))
        assert rel < 5e-3, (nh, rel)
