"""Round-4 follow-up prefill A/B: quantify (a) the dynamic valid-length
machinery's per-grid-step cost (static_valid_len variant), (b) coarser KV
DMA granularity, against the official in-tree kernel's same-session floor
(tools_prefill_flash_ab.py measured official bq512/bk512 at 2.73 ms/layer
vs ours bq512/bk1024 at 3.19)."""
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
valid = jnp.full((B,), S, jnp.int32)


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
        float(fj(q2, k, v))
        best = min(best, time.perf_counter() - t0)
    net = (best * 1e3 - 28) / N_LAYERS
    flops = 2 * 2 * S * S * D * H * 0.5
    print(f"{name}: {best*1e3:.1f} ms total, ~{net:.2f} ms/layer net, "
          f"~{flops/ (net/1e3) / 1e12:.0f} TF/s", flush=True)


def ours(bq, bk, static):
    kw = dict(causal=True, block_q=bq, block_k=bk, layout="bhsd")
    if static:
        return functools.partial(pallas_flash_attention, **kw)  # static skv
    return lambda q, k, v: pallas_flash_attention(
        q, k, v, kv_valid_len=valid, **kw)


bench("ours DYNAMIC bq512 bk1024 (shipped)", ours(512, 1024, False))
bench("ours STATIC  bq512 bk1024", ours(512, 1024, True))
bench("ours STATIC  bq512 bk512", ours(512, 512, True))
bench("ours STATIC  bq512 bk2048", ours(512, 2048, True))
bench("ours STATIC  bq1024 bk1024", ours(1024, 1024, True))

for bq, bkm, bk in ((512, 512, 512), (512, 1024, 512), (512, 2048, 512),
                    (512, 1024, 1024)):
    bs = BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk,
                    block_b=1, block_q_major_dkv=None, block_k_major_dkv=None,
                    block_k_dkv=None, block_q_dkv=None,
                    block_k_major_dq=None, block_k_dq=None, block_q_dq=None)
    bench(f"official bq{bq} bkm{bkm} bk{bk}",
          functools.partial(official_flash, causal=True, sm_scale=D**-0.5,
                            block_sizes=bs))

# parity: static vs dynamic (tiny shape, real TPU)
qs = jnp.asarray(rng.standard_normal((2, 4, 512, 64)), jnp.bfloat16)
ks = jnp.asarray(rng.standard_normal((2, 4, 512, 64)), jnp.bfloat16)
vs = jnp.asarray(rng.standard_normal((2, 4, 512, 64)), jnp.bfloat16)
vl = jnp.array([512, 380], jnp.int32)
a = pallas_flash_attention(qs, ks, vs, causal=True, kv_valid_len=vl,
                           layout="bhsd")
bst = pallas_flash_attention(qs[:1], ks[:1], vs[:1], causal=True,
                             static_valid_len=512, layout="bhsd")
print("parity static(512) vs dynamic row0:",
      float(jnp.max(jnp.abs(a[:1] - bst).astype(jnp.float32))))
bst2 = pallas_flash_attention(qs[1:], ks[1:], vs[1:], causal=True,
                              static_valid_len=380, layout="bhsd")
print("parity static(380) vs dynamic row1:",
      float(jnp.max(jnp.abs(a[1:] - bst2).astype(jnp.float32))))
