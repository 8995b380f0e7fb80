"""Sweep flash block sizes at the flagship LM prefill shape.

B=1, S=9728 (valid 9472), 14 heads, d=64, causal. Current default
bq=512/bk=1024 measured ~4.1 ms/layer in round 1.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.pallas_flash import pallas_flash_attention

B, S, H, D, VALID = 1, 9728, 14, 64, 9472
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.1, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.1, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.1, jnp.bfloat16)
valid = jnp.asarray([VALID], jnp.int32)
# causal useful flops
flops = 2 * B * H * S * S * D * 2 / 2


def build(reps, bq, bk):
    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            qi = q + i.astype(q.dtype) * 1e-3
            o = pallas_flash_attention(qi, k, v, causal=True,
                                       kv_valid_len=valid,
                                       block_q=bq, block_k=bk)
            return acc + jnp.sum(o[..., :1].astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    return run


configs = [(512, 1024), (512, 512), (1024, 512), (1024, 1024),
           (768, 768), (256, 2048), (2048, 512)]
if len(sys.argv) > 2:
    configs = [(int(sys.argv[1]), int(sys.argv[2]))]
for bq, bk in configs:
    try:
        f2, f10 = build(2, bq, bk), build(10, bq, bk)
        jax.block_until_ready(f2(q, k, v))
        jax.block_until_ready(f10(q, k, v))
        best = 1e9
        for i in range(2):
            q0 = q + jnp.bfloat16(1e-3 * (i + 1))
            t0 = time.perf_counter(); _ = float(f2(q0, k, v))
            t2 = time.perf_counter() - t0
            t0 = time.perf_counter(); _ = float(f10(q0, k, v))
            t10 = time.perf_counter() - t0
            best = min(best, (t10 - t2) / 8)
        print(f"bq={bq} bk={bk}: {best*1e3:.2f} ms/layer, "
              f"{flops/best/1e12:.1f} TF/s(causal-useful)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"bq={bq} bk={bk}: FAILED {str(e)[:160]}", flush=True)
