"""Chained fused-MLP kernel vs XLA two-matmul chain at tower shapes."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.pallas_int8 import quantize_rows
from memory_augmented_vlm_tpu.ops.pallas_mlp_int8 import fused_mlp_int8

M, K, I = 46656, 1152, 4304
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
W1 = jnp.asarray(rng.integers(-127, 128, (K, I)), jnp.int8)
S1 = jnp.full((I,), 0.02 / 127, jnp.float32)
B1 = jnp.zeros((I,), jnp.float32)
W2 = jnp.asarray(rng.integers(-127, 128, (I, K)), jnp.int8)
S2 = jnp.full((K,), 0.02 / 127, jnp.float32)
B2 = jnp.zeros((K,), jnp.float32)
flops_per_rep = 2 * M * K * I * 2


def xla_mm(x, w, s):
    xq, sx = quantize_rows(x)
    acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * s[None, :]).astype(x.dtype)


def build(reps, impl, bm=256):
    @jax.jit
    def run(x):
        def body(i, carry):
            c = carry + i.astype(carry.dtype) * 1e-3
            if impl == "fused":
                return fused_mlp_int8(c, W1, S1, B1, W2, S2, B2, block_m=bm)
            h = jax.nn.gelu(xla_mm(c, W1, S1), approximate=True)
            return xla_mm(h, W2, S2)
        out = jax.lax.fori_loop(0, reps, body, x)
        return jnp.sum(out.astype(jnp.float32))
    return run


def run_scalar(fn, x, iters=2):
    jax.block_until_ready(fn(x))
    best = 1e9
    for i in range(iters):
        x0 = x + jnp.asarray(0.001 * (i + 1), x.dtype)
        t0 = time.perf_counter()
        _ = float(fn(x0))
        best = min(best, time.perf_counter() - t0)
    return best


for impl, bm in (("xla", 0), ("fused", 256), ("fused", 128), ("fused", 512)):
    try:
        t1 = run_scalar(build(2, impl, bm), X)
        t2 = run_scalar(build(6, impl, bm), X)
        per = (t2 - t1) / 4
        rate = flops_per_rep / max(per, 1e-9) / 1e12
        print(f"{impl} bm={bm}: r2={t1*1e3:.1f}ms r6={t2*1e3:.1f}ms "
              f"-> {per*1e3:.2f} ms/mlp, {rate:.1f} TF/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{impl} bm={bm}: FAILED {str(e)[:200]}", flush=True)
