"""Tower-shape attention microbench: XLA mha vs Pallas flash variants.

Shapes: B=64 frames, H=16 heads, S=729 patches, D=72.
Useful FLOPs per attention: 2 * B*H*S*S*D * 2 = 157 GF.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.attention import mha_attention
from memory_augmented_vlm_tpu.ops.pallas_flash import (
    pallas_flash_attention as flash_attention,
)

B, S, H, D = 64, 729, 16, 72
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.1, jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.1, jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.1, jnp.bfloat16)
flops = 2 * B * H * S * S * D * 2


def build(impl, reps, **kw):
    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            qi = q + i.astype(q.dtype) * 1e-3
            if impl == "xla":
                o = mha_attention(qi, k, v)
            elif impl == "flash":
                o = flash_attention(qi, k, v, causal=False,
                                    scale=D**-0.5, **kw)
            elif impl == "flash_pad":
                pad = ((0, 0), (0, 0), (0, 0), (0, 128 - D))
                o = flash_attention(jnp.pad(qi, pad), jnp.pad(k, pad),
                                    jnp.pad(v, pad), causal=False,
                                    scale=D**-0.5, **kw)[..., :D]
            return acc + jnp.sum(o[..., :1].astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    return run


def run_one(name, impl, **kw):
    try:
        f2, f6 = build(impl, 2, **kw), build(impl, 6, **kw)
        jax.block_until_ready(f2(q, k, v))
        jax.block_until_ready(f6(q, k, v))
        best = 1e9
        for i in range(2):
            q0 = q + jnp.bfloat16(1e-3 * (i + 1))
            t0 = time.perf_counter(); _ = float(f2(q0, k, v)); t2 = time.perf_counter() - t0
            t0 = time.perf_counter(); _ = float(f6(q0, k, v)); t6 = time.perf_counter() - t0
            best = min(best, (t6 - t2) / 4)
        print(f"{name}: {best*1e3:.2f} ms/attn, {flops/best/1e12:.1f} TF/s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)


import sys
which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "xla"):
    run_one("xla mha            ", "xla")
if which in ("all", "flash"):
    run_one("flash d72 bq768 bk768", "flash", block_q=768, block_k=768)
    run_one("flash d72 bq256 bk768", "flash", block_q=256, block_k=768)
if which in ("all", "pad"):
    run_one("flash d128 bq768 bk768", "flash_pad", block_q=768, block_k=768)
