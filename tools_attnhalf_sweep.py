"""Block-size sweep for the fused attention half (fused_qkv_int8 +
flash_attention_merge_heads) at tower shapes: chained layers, differenced
rep counts (relay-safe)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.pallas_flash import flash_attention_merge_heads
from memory_augmented_vlm_tpu.ops.pallas_qkv_int8 import fused_qkv_int8
from memory_augmented_vlm_tpu.ops.quant import prequantize_kernel

B, S, H, NH = 64, 729, 1152, 16
rng = np.random.default_rng(0)
hid = jnp.asarray(rng.standard_normal((B, S, H)) * 0.1, jnp.bfloat16)
lnw = jnp.asarray(rng.standard_normal(H) * 0.02 + 1, jnp.float32)
lnb = jnp.asarray(rng.standard_normal(H) * 0.02, jnp.float32)
Ws, Ss, Bs = [], [], []
for i in range(3):
    w = jnp.asarray(rng.standard_normal((H, H)) * 0.02, jnp.float32)
    wq, sc = prequantize_kernel(w)
    Ws.append(wq); Ss.append(sc)
    Bs.append(jnp.asarray(rng.standard_normal(H) * 0.01, jnp.float32))


def chain(reps, block_r, block_q):
    @jax.jit
    def run(hid):
        def body(i, c):
            c = c + i.astype(c.dtype) * 1e-6
            q, k, v = fused_qkv_int8(
                c, lnw, lnb, Ws[0], Ss[0], Bs[0], Ws[1], Ss[1], Bs[1],
                Ws[2], Ss[2], Bs[2], nh=NH, eps=1e-6, block_r=block_r)
            a = flash_attention_merge_heads(
                q, k, v, jnp.full((B,), S, jnp.int32), block_q=block_q)
            return c + 0.1 * a[:, :S]
        out = jax.lax.fori_loop(0, reps, body, hid)
        return jnp.sum(out[..., 0].astype(jnp.float32))
    return run


for br, bq in [(384, 128), (384, 256), (768, 128), (256, 128), (384, 64)]:
    try:
        f2, f10 = chain(2, br, bq), chain(10, br, bq)
        _ = float(f2(hid)); _ = float(f10(hid))
        best = 1e9
        for i in range(3):
            h0 = hid + jnp.bfloat16(1e-3 * (i + 1))
            t0 = time.perf_counter(); _ = float(f2(h0)); t2 = time.perf_counter() - t0
            t0 = time.perf_counter(); _ = float(f10(h0)); t10 = time.perf_counter() - t0
            best = min(best, (t10 - t2) / 8)
        print(f"block_r={br} block_q={bq}: {best*1e3:.2f} ms/layer-half", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"block_r={br} block_q={bq}: FAILED {str(e)[:150]}", flush=True)
