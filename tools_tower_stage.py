"""Direct tower-stage timing: siglip.forward over 64 frames, int8 paths."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VisionConfig
from memory_augmented_vlm_tpu.models import siglip

cfg = VisionConfig()
params = siglip.init_params(cfg, jax.random.key(0), jnp.bfloat16)
qparams = siglip.prequantize_int8(params)
rng = np.random.default_rng(0)
pix = jnp.asarray(rng.standard_normal((64, 384, 384, 3)), jnp.bfloat16)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for i in range(4):
        p0 = args[-1] + jnp.bfloat16(1e-3 * (i + 1))
        t0 = time.perf_counter()
        out = fn(*args[:-1], p0)
        _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)


mode = sys.argv[1] if len(sys.argv) > 1 else "all"
if mode in ("all", "fused"):
    timeit("tower int8 fused-mlp", jax.jit(
        lambda p, x: siglip.forward(p, cfg, x, int8=True)), qparams, pix)
if mode in ("all", "bf16"):
    timeit("tower bf16", jax.jit(
        lambda p, x: siglip.forward(p, cfg, x)), params, pix)
