"""A/B the int8 tower: fused Pallas MLP block vs unfused XLA int8 chain."""
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


def timeit(name, fn, p, x):
    out = fn(p, x)
    jax.block_until_ready(out)
    best = 1e9
    for i in range(5):
        x0 = x + jnp.bfloat16(1e-3 * (i + 1))
        t0 = time.perf_counter()
        out = fn(p, x0)
        _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)


mode = sys.argv[1] if len(sys.argv) > 1 else "both"
if mode in ("both", "fused"):
    timeit("tower int8 FUSED  ", jax.jit(
        lambda p, x: siglip.forward(p, cfg, x, fused_mlp=True)), qparams, pix)
if mode in ("both", "unfused"):
    timeit("tower int8 UNFUSED", jax.jit(
        lambda p, x: siglip.forward(p, cfg, x, fused_mlp=False)), qparams, pix)
