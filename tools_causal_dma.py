"""Does causal block skipping actually save wall-clock at the prefill
shape, or does the skipped blocks' DMA/grid overhead dominate? Times the
flash kernel causal vs non-causal at (1, 9728, 14, 64); if causal ~=
non-causal, ~half the attention time is recoverable by restructuring."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.pallas_flash import pallas_flash_attention as flash_attention

B, S, H, D = 1, 9728, 14, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
valid = jnp.asarray([9472], jnp.int32)

N_LAYERS = 8  # amortize the ~28 ms dispatch floor over a layer stack


def stack(causal, block_q, block_k):
    def f(q, k, v):
        out = q
        for _ in range(N_LAYERS):
            out = flash_attention(out, k, v, kv_valid_len=valid,
                                  causal=causal, block_q=block_q,
                                  block_k=block_k)
        return jnp.sum(out[..., :1].astype(jnp.float32))
    return jax.jit(f)


for causal in (True, False):
    for bq, bk in ((512, 1024), (512, 512), (1024, 512)):
        f = stack(causal, bq, bk)
        float(f(q, k, v))  # compile
        best = 1e9
        for i in range(3):
            q2 = q + jnp.bfloat16(1e-3 * (i + 1))
            t0 = time.perf_counter()
            val = float(f(q2, k, v))
            best = min(best, time.perf_counter() - t0)
        per_layer = (best * 1e3) / N_LAYERS
        print(f"causal={causal} bq={bq} bk={bk}: {per_layer:.2f} ms/layer",
              flush=True)
