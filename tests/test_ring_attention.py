"""Sequence-parallel ring attention (ops/ring_attention.py) on the 8-device
CPU mesh: forward parity vs the dense oracle, gradient parity (the ring is
plain jnp + ppermute, so autodiff must match), padding/odd lengths, and the
end-to-end sp-sharded qwen2 prefill matching the single-device forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import LMConfig, MeshConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.ops.attention import mha_attention
from memory_augmented_vlm_tpu.ops.ring_attention import ring_attention, sp_size
from memory_augmented_vlm_tpu.parallel.mesh import build_mesh


def _mk(b=2, s=64, h=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float32)
    return q, k, v


def _mesh(sp=8, **kw):
    return build_mesh(MeshConfig(sp=sp, **kw))


def _oracle(q, k, v, valid):
    mask = jnp.arange(k.shape[1])[None, None, None, :] < \
        valid[:, None, None, None]
    return mha_attention(q, k, v, mask=mask, causal=True)


def test_ring_matches_dense_causal():
    q, k, v = _mk()
    valid = jnp.asarray([64, 50], jnp.int32)
    want = _oracle(q, k, v, valid)
    with jax.set_mesh(_mesh(sp=8)):
        got = jax.jit(lambda *a: ring_attention(
            *a[:3], kv_valid_len=a[3], causal=True))(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_pads_odd_lengths():
    q, k, v = _mk(s=60)  # 60 % 8 != 0 -> internal pad to 64
    valid = jnp.asarray([60, 41], jnp.int32)
    want = _oracle(q, k, v, valid)
    with jax.set_mesh(_mesh(sp=8)):
        got = jax.jit(lambda *a: ring_attention(
            *a[:3], kv_valid_len=a[3]))(q, k, v, valid)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_non_causal():
    q, k, v = _mk(s=32)
    valid = jnp.asarray([32, 20], jnp.int32)
    mask = jnp.arange(32)[None, None, None, :] < valid[:, None, None, None]
    want = mha_attention(q, k, v, mask=mask, causal=False)
    with jax.set_mesh(_mesh(sp=4, data=2)):
        got = jax.jit(lambda *a: ring_attention(
            *a[:3], kv_valid_len=a[3], causal=False))(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_gradients_match_dense():
    q, k, v = _mk(s=32)
    valid = jnp.asarray([32, 27], jnp.int32)
    co = jnp.asarray(
        np.random.default_rng(1).standard_normal(q.shape), jnp.float32)

    def loss_dense(q, k, v):
        return (_oracle(q, k, v, valid) * co).sum()

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, kv_valid_len=valid) * co).sum()

    gw = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    with jax.set_mesh(_mesh(sp=4, fsdp=2)):
        gg = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gg, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_sp_size_reports_ambient_mesh():
    assert sp_size() == 1  # no mesh context
    with jax.set_mesh(_mesh(sp=4, data=2)):
        @jax.jit
        def probe(x):
            return x * sp_size()

        assert int(probe(jnp.asarray(1))) == 4


def test_qwen2_prefill_sp_matches_single_device():
    cfg = LMConfig(
        vocab_size=50000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10000.0, dtype="float32",
    )
    params = qwen2.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    b, s = 2, 48
    embeds = jnp.asarray(rng.standard_normal((b, s, 64)) * 0.1, jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    valid = jnp.asarray([48, 37], jnp.int32)

    hidden_1dev, _ = qwen2.forward(params, cfg, embeds, positions,
                                   valid_len=valid)
    with jax.set_mesh(_mesh(sp=4, data=2)):
        hidden_sp, _ = jax.jit(
            lambda p, e: qwen2.forward(p, cfg, e, positions,
                                       valid_len=valid))(params, embeds)
    # compare valid rows only (pad rows see different attention denominators)
    for i, n in enumerate([48, 37]):
        np.testing.assert_allclose(
            np.asarray(hidden_sp)[i, :n], np.asarray(hidden_1dev)[i, :n],
            rtol=1e-4, atol=1e-4)


def test_qwen2_train_grads_sp(tmp_path):
    """Gradients of a CE-style loss through the sp-sharded prefill match the
    single-device gradients (ring attention is the only differing op)."""
    cfg = LMConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=10000.0, dtype="float32",
    )
    params = qwen2.init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(2)
    b, s = 2, 32
    embeds = jnp.asarray(rng.standard_normal((b, s, 32)) * 0.1, jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))

    def loss(p, e):
        hidden, _ = qwen2.forward(p, cfg, e, positions)
        return (hidden.astype(jnp.float32) ** 2).mean()

    g1 = jax.grad(loss)(params, embeds)
    with jax.set_mesh(_mesh(sp=4, fsdp=2)):
        g2 = jax.jit(jax.grad(loss))(params, embeds)
    flat1, _ = jax.tree_util.tree_flatten(g1)
    flat2, _ = jax.tree_util.tree_flatten(g2)
    for a, b_ in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)
