"""Same-session A/B: fused LN+quant+QKV Pallas kernel (head-major out +
bhsd flash) vs the composed XLA int8 path. Full int8 tower, 64 frames."""
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


def timeit(name, **kw):
    fn = jax.jit(lambda p, x: siglip.forward(p, cfg, x, **kw))
    jax.block_until_ready(fn(qparams, pix))
    best = 1e9
    for i in range(5):
        x0 = pix + jnp.bfloat16(1e-3 * (i + 1))
        t0 = time.perf_counter()
        out = fn(qparams, x0)
        _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "both"
if which in ("both", "composed"):
    timeit("tower int8 composed ", fused_qkv=False)
if which in ("both", "fusedqkv"):
    timeit("tower int8 fusedqkv", fused_qkv=True)
if which in ("both", "oproj"):
    timeit("tower int8 fused+oproj", fused_qkv=True, fused_oproj=True)
