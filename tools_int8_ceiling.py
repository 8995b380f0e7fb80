"""Int8 MXU ceiling experiments at tower shapes (PERFORMANCE.md round 3).

Relay-proof methodology: each measurement is ONE jit containing `reps`
chained matmuls reduced to a scalar in-graph; the rate comes from
differencing two rep counts, which cancels the ~28 ms dispatch floor and
any fixed per-call overhead.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 46656, 1152, 4304
mm_flops = 2 * M * K * N


rng = np.random.default_rng(0)
XQ = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
WQ = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
XB = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
WB = jnp.asarray(rng.standard_normal((K, N)) * 0.1, jnp.bfloat16)


def run_scalar(fn, x, iters=2):
    out = fn(x)
    jax.block_until_ready(out)
    best = 1e9
    for i in range(iters):
        x0 = x + jnp.asarray(1 + i, x.dtype)
        t0 = time.perf_counter()
        _ = float(fn(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def pair(name, build, x, flops_per_rep, r1=4, r2=12):
    t1 = run_scalar(build(r1), x)
    t2 = run_scalar(build(r2), x)
    rate = (r2 - r1) * flops_per_rep / max(t2 - t1, 1e-9) / 1e12
    print(f"{name}: r{r1}={t1*1e3:.1f}ms r{r2}={t2*1e3:.1f}ms  "
          f"-> {rate:.1f} TF/s", flush=True)


def build_xla(int8):
    w = WQ if int8 else WB

    def factory(reps):
        @jax.jit
        def run(x):
            def body(i, acc):
                xi = x + i.astype(x.dtype)
                pref = jnp.int32 if int8 else jnp.float32
                d = jax.lax.dot_general(xi, w, (((1,), (0,)), ((), ())),
                                        preferred_element_type=pref)
                return acc + d[:1, :1].astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))
        return run
    return factory


pair("xla bf16", build_xla(False), XB, mm_flops)
pair("xla int8->s32", build_xla(True), XQ, mm_flops)


# --- Pallas weights-stationary, chained inside one jit ---
N_PAD = 4352
WQ_PAD = jnp.pad(WQ, ((0, 0), (0, N_PAD - N)))


def _ws_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.bfloat16)


def build_pallas(bm, bn, order):
    mp = ((M + bm - 1) // bm) * bm

    def one(xp):
        if order == "wstat":
            grid = (N_PAD // bn, mp // bm)
            xspec = pl.BlockSpec((bm, K), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
            wspec = pl.BlockSpec((K, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM)
            ospec = pl.BlockSpec((bm, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM)
        else:
            grid = (mp // bm, N_PAD // bn)
            xspec = pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
            wspec = pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
            ospec = pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _ws_kernel, grid=grid,
            in_specs=[xspec, wspec], out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((mp, N_PAD), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )

    def factory(reps):
        @jax.jit
        def run(x):
            xp = jnp.pad(x, ((0, mp - M), (0, 0)))

            def body(i, acc):
                xi = xp + i.astype(jnp.int8)
                out = one(xp)(xi, WQ_PAD)
                return acc + out[:1, :1].astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))
        return run
    return factory


for order in ("wstat", "xstat"):
    for bm, bn in ((512, 512), (1024, 512), (512, 1088)):
        pair(f"pallas int8 {order} bm={bm} bn={bn}",
             build_pallas(bm, bn, order), XQ, mm_flops)
