"""Quick relay/chip health probe: times a big matmul and the int8 tower
with DISTINCT inputs per rep (relay caches identical executions).
Compare against known-good: matmul 4k^3 ~ few ms, tower ~0.28 s."""
import time

import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
b = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.bfloat16)
f = jax.jit(lambda a, b: jnp.sum((a @ b).astype(jnp.float32)[:1, :1]))
print("devices:", jax.devices(), flush=True)
_ = float(f(a, b))
for i in range(3):
    a2 = a + jnp.bfloat16(1e-3 * (i + 1))
    t0 = time.perf_counter()
    _ = float(f(a2, b))
    print(f"matmul rep {i}: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

from memory_augmented_vlm_tpu.config import VisionConfig
from memory_augmented_vlm_tpu.models import siglip

cfg = VisionConfig()
params = siglip.prequantize_int8(
    siglip.init_params(cfg, jax.random.key(0), jnp.bfloat16))
pix = jnp.asarray(rng.standard_normal((64, 384, 384, 3)), jnp.bfloat16)
tf = jax.jit(lambda p, x: jnp.sum(
    siglip.forward(p, cfg, x).astype(jnp.float32)[:1, :1, :1]))
_ = float(tf(params, pix))
for i in range(3):
    x2 = pix + jnp.bfloat16(1e-3 * (i + 1))
    t0 = time.perf_counter()
    _ = float(tf(params, x2))
    print(f"tower rep {i}: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
