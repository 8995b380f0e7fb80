"""Chained (dependent) int8 MLP benchmark: f2(f1(x)) repeated, where f1 is
(M,1152)->(M,4304) and f2 is (M,4304)->(M,1152), each with per-row
activation quantization — the realistic tower MLP dependency chain.
Differencing two rep counts cancels the relay dispatch floor."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.pallas_int8 import (
    int8_matmul, int8_matmul_reference, quantize_rows)

M, K, N = 46656, 1152, 4304
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
W1 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
S1 = jnp.full((N,), 0.02 / 127, jnp.float32)
W2 = jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)
S2 = jnp.full((K,), 0.02 / 127, jnp.float32)
flops_per_rep = 2 * M * K * N * 2


def xla_int8_mm(x, w, s):
    xq, sx = quantize_rows(x)
    acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * s[None, :]).astype(x.dtype)


def build(reps, impl):
    mm = (lambda x, w, s: int8_matmul(x, w, s)) if impl == "pallas" \
        else xla_int8_mm

    @jax.jit
    def run(x):
        def body(i, carry):
            h = mm(carry + i.astype(carry.dtype) * 1e-3, W1, S1)
            return mm(h, W2, S2)
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


for impl in ("xla", "pallas"):
    t1 = run_scalar(build(2, impl), X)
    t2 = run_scalar(build(6, impl), X)
    rate = 4 * flops_per_rep / max(t2 - t1, 1e-9) / 1e12
    print(f"{impl}: r2={t1*1e3:.1f}ms r6={t2*1e3:.1f}ms -> {rate:.1f} TF/s",
          flush=True)
