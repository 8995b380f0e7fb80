"""A/B our prefill flash vs the official jax.experimental pallas TPU flash
at the LM prefill shape (1, 14, 9728, 64) causal — the profiler trace puts
prefill attention at 83.9 ms (3.5 ms/layer = ~49 TF/s on the executed
causal half; the K=64 half-MXU ceiling is ~98 TF/s, so up to 2x may be on
the table if the official kernel schedules better)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    flash_attention as official_flash,
)

from memory_augmented_vlm_tpu.ops.pallas_flash import pallas_flash_attention

B, S, H, D = 1, 9728, 14, 64
N_LAYERS = 8
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)


def bench(name, call):
    def f(q, k, v):
        out = q
        for _ in range(N_LAYERS):
            out = call(out, k, v)
        return jnp.sum(out[..., :1].astype(jnp.float32))
    fj = jax.jit(f)
    try:
        float(fj(q, k, v))
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return
    best = 1e9
    for i in range(3):
        q2 = q + jnp.bfloat16(1e-3 * (i + 1))
        t0 = time.perf_counter()
        val = float(fj(q2, k, v))
        best = min(best, time.perf_counter() - t0)
    net = (best * 1e3 - 28) / N_LAYERS  # subtract the dispatch floor
    flops = 2 * 2 * S * S * D * H * 0.5  # executed causal half
    print(f"{name}: {best*1e3:.1f} ms total, ~{net:.2f} ms/layer net, "
          f"~{flops/ (net/1e3) / 1e12:.0f} TF/s", flush=True)


for bq, bk in ((512, 1024), (512, 512), (256, 512), (1024, 512)):
    bench(f"ours bq{bq} bk{bk}",
          functools.partial(pallas_flash_attention, causal=True,
                            block_q=bq, block_k=bk, layout="bhsd"))

for bq, bkm, bk in ((512, 512, 512),):
    bs = BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk,
                    block_b=1, block_q_major_dkv=None, block_k_major_dkv=None,
                    block_k_dkv=None, block_q_dkv=None,
                    block_k_major_dq=None, block_k_dq=None, block_q_dq=None)
    bench(f"official bq{bq} bk{bk}",
          functools.partial(official_flash, causal=True, sm_scale=D**-0.5,
                            block_sizes=bs))
