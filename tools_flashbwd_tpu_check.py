"""On-chip check of the rewritten flash backward: numerics vs XLA reference
at S=512, then isolated fwd+bwd timing at the flagship layer shape."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.pallas_flash import _xla_attention
from memory_augmented_vlm_tpu.ops.pallas_flash_bwd import flash_attention_train


def grads(fn, q, k, v):
    def loss(q, k, v):
        out = fn(q, k, v)
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) / out.size
        return jnp.sum(out.astype(jnp.float32) * w)
    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


# --- numerics at S=512, fp32 ---
rng = np.random.default_rng(0)
b, s, h, d = 1, 512, 2, 64
q = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.3, jnp.float32)
k = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.3, jnp.float32)
v = jnp.asarray(rng.standard_normal((b, s, h, d)) * 0.3, jnp.float32)
vl = jnp.asarray([450], jnp.int32)
ref = grads(lambda q, k, v: _xla_attention(q, k, v, vl, True, d**-0.5), q, k, v)
got = grads(lambda q, k, v: flash_attention_train(
    q, k, v, causal=True, kv_valid_len=vl, block_q=256, block_k=256), q, k, v)
for name, a, bb in zip("qkv", got, ref):
    err = float(jnp.max(jnp.abs(a - bb)))
    print(f"d{name} max err on-chip: {err:.2e}")

# --- isolated timing at flagship layer shape ---
s = 9728
h = 14
q = jnp.asarray(rng.standard_normal((1, s, h, d)) * 0.3, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((1, s, h, d)) * 0.3, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((1, s, h, d)) * 0.3, jnp.bfloat16)
vl = jnp.asarray([9472], jnp.int32)


def bench(name, fn):
    lossgrad = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32)),
        argnums=(0, 1, 2)))
    g = lossgrad(q, k, v)
    float(jnp.sum(g[0].astype(jnp.float32)))  # force
    times = []
    for i in range(3):
        qq = q + jnp.bfloat16(i * 1e-3)  # vary input: relay caches identical calls
        t0 = time.perf_counter()
        g = lossgrad(qq, k, v)
        float(jnp.sum(g[0].astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    print(f"{name}: fwd+bwd {min(times)*1e3:.1f} ms  (all: {[round(t*1e3,1) for t in times]})")


bench("ours(512/512)", lambda q, k, v: flash_attention_train(
    q, k, v, causal=True, kv_valid_len=vl))
bench("ours(1024/512)", lambda q, k, v: flash_attention_train(
    q, k, v, causal=True, kv_valid_len=vl, block_q=1024, block_k=512))
bench("ours(512/1024)", lambda q, k, v: flash_attention_train(
    q, k, v, causal=True, kv_valid_len=vl, block_q=512, block_k=1024))


def intree(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention as jax_flash)
    ids = (jnp.arange(q.shape[1])[None, :] < vl[:, None]).astype(jnp.int32)
    seg = SegmentIds(q=ids, kv=ids)
    out = jax_flash(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), segment_ids=seg, causal=True,
                    sm_scale=d**-0.5)
    return out.transpose(0, 2, 1, 3)


bench("intree", intree)
