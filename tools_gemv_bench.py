"""Decode GEMV bandwidth probe: XLA vs Pallas streaming at 0.5B shapes.

Decode is weight-streaming-bound (B=1). Chains y=x@W1; x'=y@W2 over L
distinct weight pairs, modeling the per-layer MLP (896x4864, 4864x896).
Useful bytes per chain step = 8.7 MB; v5e peak ~819 GB/s.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, I, L = 896, 4864, 12
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((1, H)) * 0.1, jnp.bfloat16)
W1 = jnp.asarray(rng.standard_normal((L, H, I)) * 0.02, jnp.bfloat16)
W2 = jnp.asarray(rng.standard_normal((L, I, H)) * 0.02, jnp.bfloat16)
BYTES = L * (H * I + I * H) * 2


def _gemv_kernel(x_ref, w_ref, o_ref, acc):
    # stream W in (H, BN) blocks; x stays resident
    j = pl.program_id(0)
    o_ref[...] = jnp.dot(x_ref[...].astype(jnp.float32),
                         w_ref[...].astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(o_ref.dtype)
    del acc, j


def pallas_gemv(xv, w, block_n=2048):
    k, n = w.shape
    assert n % block_n == 0
    return pl.pallas_call(
        _gemv_kernel,
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((1, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), xv.dtype),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(xv, w)


def build(reps, impl):
    @jax.jit
    def run(x, w1, w2):
        def body(i, carry):
            c = carry + i.astype(carry.dtype) * 1e-4

            def layer(l, h):
                if impl == "xla":
                    y = jnp.dot(h, w1[l])
                    return jnp.dot(y, w2[l])
                y = pallas_gemv(h, w1[l])
                return pallas_gemv(y, w2[l], block_n=896 // 128 * 128)
            c = jax.lax.fori_loop(0, L, layer, c)
            return c
        out = jax.lax.fori_loop(0, reps, body, x)
        return jnp.sum(out.astype(jnp.float32))
    return run


which = sys.argv[1] if len(sys.argv) > 1 else "all"
for impl in (["xla", "pallas"] if which == "all" else [which]):
    try:
        f2, f10 = build(2, impl), build(10, impl)
        # warm both compiles AND run each once more (first timed execution
        # through the relay can include queue effects — discard it)
        for f in (f2, f10):
            _ = float(f(x, W1, W2))
            _ = float(f(x + jnp.bfloat16(1e-4), W1, W2))
        t2s, t10s = [], []
        for i in range(3):
            x0 = x + jnp.bfloat16(1e-4 * (i + 2))
            t0 = time.perf_counter(); _ = float(f2(x0, W1, W2))
            t2s.append(time.perf_counter() - t0)
            x1 = x + jnp.bfloat16(1e-4 * (i + 2) + 3e-5)
            t0 = time.perf_counter(); _ = float(f10(x1, W1, W2))
            t10s.append(time.perf_counter() - t0)
        best = (min(t10s) - min(t2s)) / 8
        gbs = BYTES / best / 1e9
        print(f"gemv {impl}: {best*1e3:.2f} ms/chain "
              f"(t2 {min(t2s)*1e3:.1f}, t10 {min(t10s)*1e3:.1f}), "
              f"{gbs:.0f} GB/s ({gbs/819*100:.0f}% of peak)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"gemv {impl}: FAILED {str(e)[:200]}", flush=True)
