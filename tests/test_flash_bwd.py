"""Tiled flash backward: gradient parity vs the exact XLA attention at fp32
(CPU interpret mode), across causal/cross shapes, padding, and multi-block
grids."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.pallas_flash import _xla_attention
from memory_augmented_vlm_tpu.ops.pallas_flash_bwd import flash_attention_train


def _grads(fn, q, k, v):
    def loss(q, k, v):
        out = fn(q, k, v)
        # non-uniform cotangent exercises every grad path
        w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape) / out.size
        return jnp.sum(out * w)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


CASES = [
    # (B, Sq, Skv, H, D, causal, valid)
    (1, 256, 256, 2, 64, True, None),
    (2, 384, 384, 2, 64, True, (300, 384)),      # padded rows + multi-batch
    (1, 256, 512, 2, 64, False, None),           # cross-attention
    (2, 128, 384, 3, 128, False, (200, 384)),    # cross + padding + D=128
]


@pytest.mark.parametrize("case", CASES)
def test_backward_matches_xla_reference(case):
    b, sq, skv, h, d, causal, valid = case
    rng = np.random.default_rng(hash(case) % 2**31)
    q = jnp.asarray(rng.standard_normal((b, sq, h, d)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, skv, h, d)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, skv, h, d)) * 0.3, jnp.float32)
    vl = (jnp.asarray(valid, jnp.int32) if valid
          else jnp.full((b,), skv, jnp.int32))
    scale = d**-0.5

    ref_fn = lambda q, k, v: _xla_attention(q, k, v, vl, causal, scale)
    got_fn = lambda q, k, v: flash_attention_train(
        q, k, v, causal=causal, kv_valid_len=vl, scale=scale,
        block_q=128, block_k=128, interpret=True)

    out_ref = np.asarray(ref_fn(q, k, v))
    out_got = np.asarray(got_fn(q, k, v))
    np.testing.assert_allclose(out_got, out_ref, rtol=2e-5, atol=2e-5)

    g_ref = _grads(ref_fn, q, k, v)
    g_got = _grads(got_fn, q, k, v)
    for name, a, bb in zip("qkv", g_got, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch for case {case}")


def test_padded_region_grads_are_zero():
    b, s, h, d = 1, 256, 2, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.3, jnp.float32)
    vl = jnp.asarray([160], jnp.int32)

    def loss(q, k, v):
        out = flash_attention_train(q, k, v, causal=True, kv_valid_len=vl,
                                    block_q=128, block_k=128, interpret=True)
        return jnp.sum(out[:, :160].astype(jnp.float32) ** 2)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    # keys/values beyond the valid prefix receive no gradient
    np.testing.assert_allclose(np.asarray(dk)[:, 160:], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv)[:, 160:], 0.0, atol=1e-6)
