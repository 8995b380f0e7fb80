"""Resampler registry tests (dormant capability surface, SURVEY.md 2.4)."""

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.models import resampler

RNG = np.random.default_rng(0)


def test_identity_passthrough():
    x = jnp.asarray(RNG.standard_normal((2, 16, 8)), jnp.float32)
    assert resampler.forward({}, None, x) is x


def test_masked_drop():
    x = jnp.asarray(RNG.standard_normal((2, 16, 8)), jnp.float32)
    out = resampler.forward({}, "masked_drop", x, train=True,
                            rng=jax.random.key(0), drop_ratio=0.5)
    assert out.shape == (2, 8, 8)
    # eval mode: no dropping
    assert resampler.forward({}, "masked_drop", x, train=False).shape == x.shape
    # kept tokens are a subset of originals, order preserved
    xs = np.asarray(x[0])
    for tok in np.asarray(out[0]):
        assert any(np.allclose(tok, row) for row in xs)


def test_spatial_pool():
    x = jnp.asarray(RNG.standard_normal((2, 16, 8)), jnp.float32)
    out = resampler.forward({}, "spatial_pool", x, pool_stride=2)
    assert out.shape == (2, 4, 8)


def test_perceiver_latents():
    params = resampler.init_params("perceiver", jax.random.key(0),
                                   hidden=16, latents=4, depth=2, heads=4)
    x = jnp.asarray(RNG.standard_normal((3, 25, 16)), jnp.float32)
    out = resampler.forward(params, "perceiver", x, heads=4)
    assert out.shape == (3, 4, 16)
    assert np.isfinite(np.asarray(out)).all()
    # jit-able
    out2 = jax.jit(lambda p, x: resampler.forward(p, "perceiver", x, heads=4),
                   static_argnames=())(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5, atol=1e-6)
