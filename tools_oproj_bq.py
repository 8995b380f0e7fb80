"""Probe flash_attention_out_proj_int8 block_q sizes on the real chip:
block_q=128 OOMs scoped VMEM at the tower shape (16.19M vs 16M limit);
check 64/32 standalone, then the full tower in-context at the winner."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.pallas_flash import (
    flash_attention_merge_heads, flash_attention_out_proj_int8)

B, NH, S, D = 64, 16, 768, 72
H = NH * D
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, NH, S, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, NH, S, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, NH, S, D)), jnp.bfloat16)
hid = jnp.asarray(rng.standard_normal((B, S, H)), jnp.bfloat16)
wo = jnp.asarray(rng.integers(-127, 128, (H, H)), jnp.int8)
so = jnp.full((H,), 0.02 / 127, jnp.float32)
bo = jnp.zeros((H,), jnp.float32)
vl = jnp.full((B,), 729, jnp.int32)


def timeit(name, fn, *args, reps=5):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {str(e)[:140]}", flush=True)
        return
    best = 1e9
    for i in range(reps):
        a0 = args[0] + jnp.bfloat16(1e-3 * (i + 1))
        t0 = time.perf_counter()
        out = fn(a0, *args[1:])
        _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.2f} ms", flush=True)


for bq in (128, 64, 32):
    timeit(f"oproj bq={bq}", jax.jit(
        lambda q, k, v, hid, bq=bq: flash_attention_out_proj_int8(
            q, k, v, vl, hid, wo, so, bo, block_q=bq)), q, k, v, hid)

timeit("merge_heads (ref)", jax.jit(
    lambda q, k, v: flash_attention_merge_heads(q, k, v, vl)), q, k, v)
