"""Pipeline-parallel layer scan (ops/pipeline.py) on the 8-device CPU mesh:
the pipelined scan must reproduce the plain lax.scan (values and gradients),
and the pp-sharded qwen2 loss path must match the single-device forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import LMConfig, MeshConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.ops.pipeline import pipeline_scan, pp_size
from memory_augmented_vlm_tpu.parallel.mesh import build_mesh


def _mesh(pp=4, **kw):
    return build_mesh(MeshConfig(pp=pp, **kw))


def _toy_layers(nl=8, h=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.standard_normal((nl, h, h)) * 0.2, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((nl, h)) * 0.1, jnp.float32),
    }


def _toy_body(payload, lp):
    x, scale = payload
    x = x + jnp.tanh(x @ lp["w"] + lp["b"]) * scale[:, None, None]
    return (x, scale), None


def test_pipeline_scan_matches_plain_scan():
    layers = _toy_layers()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 6, 16)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (8,)), jnp.float32)

    want, _ = jax.lax.scan(_toy_body, (x, scale), layers)
    with jax.set_mesh(_mesh(pp=4, data=2)):
        got = jax.jit(lambda p, l: pipeline_scan(_toy_body, p, l))(
            (x, scale), layers)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(scale))


def test_pipeline_scan_extra_microbatches():
    layers = _toy_layers()
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 4, 16)), jnp.float32)
    scale = jnp.ones((8,), jnp.float32)
    want, _ = jax.lax.scan(_toy_body, (x, scale), layers)
    with jax.set_mesh(_mesh(pp=2, data=2)):  # local batch 4, 4 microbatches
        got = jax.jit(lambda p, l: pipeline_scan(
            _toy_body, p, l, num_microbatches=4))((x, scale), layers)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_scan_gradients():
    layers = _toy_layers(nl=4)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 3, 16)), jnp.float32)
    scale = jnp.ones((4,), jnp.float32)

    def loss_plain(layers, x):
        (y, _), _ = jax.lax.scan(_toy_body, (x, scale), layers)
        return (y ** 2).mean()

    def loss_pipe(layers, x):
        y, _ = pipeline_scan(_toy_body, (x, scale), layers)
        return (y ** 2).mean()

    gw = jax.grad(loss_plain, argnums=(0, 1))(layers, x)
    with jax.set_mesh(_mesh(pp=4)):
        gg = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(layers, x)
    for a, b in zip(jax.tree.leaves(gg), jax.tree.leaves(gw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_pp_size_and_guards():
    assert pp_size() == 1
    layers = _toy_layers(nl=6)  # 6 % 4 != 0
    x = jnp.ones((4, 2, 16))
    with jax.set_mesh(_mesh(pp=4)):
        with pytest.raises(ValueError, match="divide"):
            pipeline_scan(_toy_body, (x, jnp.ones((4,))), layers)


def test_qwen2_pp_loss_path_matches_single_device():
    cfg = LMConfig(
        vocab_size=512, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=10000.0, dtype="float32",
    )
    params = qwen2.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(4)
    b, s = 4, 24
    embeds = jnp.asarray(rng.standard_normal((b, s, 32)) * 0.1, jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    valid = jnp.asarray([24, 17, 24, 9], jnp.int32)

    want, cache = qwen2.forward(params, cfg, embeds, positions,
                                valid_len=valid)
    assert cache is not None
    with jax.set_mesh(_mesh(pp=2, data=2)):
        got, no_cache = jax.jit(
            lambda p, e: qwen2.forward(p, cfg, e, positions, valid_len=valid,
                                       need_cache=False))(params, embeds)
    assert no_cache is None  # pp path skips cache assembly
    for i, n in enumerate([24, 17, 24, 9]):
        np.testing.assert_allclose(
            np.asarray(got)[i, :n], np.asarray(want)[i, :n],
            rtol=1e-4, atol=1e-4)


def test_qwen2_pp_microbatch_knob():
    """cfg.pp_microbatches > stages shrinks the bubble and still matches."""
    cfg = LMConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=10000.0, dtype="float32", pp_microbatches=4,
    )
    params = qwen2.init_params(cfg, jax.random.key(2))
    rng = np.random.default_rng(6)
    b, s = 8, 12
    embeds = jnp.asarray(rng.standard_normal((b, s, 32)) * 0.1, jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))

    want, _ = qwen2.forward(params, cfg, embeds, positions)
    with jax.set_mesh(_mesh(pp=2, data=2)):  # local batch 4 = 4 microbatches
        got, _ = jax.jit(
            lambda p, e: qwen2.forward(p, cfg, e, positions,
                                       need_cache=False))(params, embeds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_qwen2_pp_gradients_match():
    cfg = LMConfig(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=10000.0, dtype="float32",
    )
    params = qwen2.init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(5)
    b, s = 8, 16
    embeds = jnp.asarray(rng.standard_normal((b, s, 32)) * 0.1, jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))

    def loss(p, e, need_cache):
        hidden, _ = qwen2.forward(p, cfg, e, positions,
                                  need_cache=need_cache)
        return (hidden.astype(jnp.float32) ** 2).mean()

    g1 = jax.grad(loss)(params, embeds, True)
    with jax.set_mesh(_mesh(pp=4, fsdp=2)):  # local batch 4 = 4 microbatches
        g2 = jax.jit(jax.grad(lambda p, e: loss(p, e, False)))(params, embeds)
    for a, b_ in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)
