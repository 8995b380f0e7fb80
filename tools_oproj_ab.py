"""A/B the fused attention half's out-projection arrangement on the int8
tower: fused_oproj=True (attention + int8 out-proj + residual in one Pallas
pass, whole-stream 768 padding) vs the default merge-heads path.

Run on the real TPU; compare within-session only (relay variance)."""
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


def timeit(name, fn, p, x, reps=5):
    out = fn(p, x)
    jax.block_until_ready(out)
    best = 1e9
    for i in range(reps):
        x0 = x + jnp.bfloat16(1e-3 * (i + 1))
        t0 = time.perf_counter()
        out = fn(p, x0)
        _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return best


mode = sys.argv[1] if len(sys.argv) > 1 else "both"
COMBOS = {
    "merge":     dict(fused_oproj=False, fused_mlp=False),  # current default
    "oproj":     dict(fused_oproj=True, fused_mlp=False),
    "oproj+mlp": dict(fused_oproj=True, fused_mlp=True),   # all-Pallas layer
    "mlp":       dict(fused_oproj=False, fused_mlp=True),
}
for name, kw in COMBOS.items():
    if mode in ("both", "all", name):
        timeit(f"tower int8 {name:10s}", jax.jit(
            lambda p, x, kw=kw: siglip.forward(p, cfg, x, **kw)),
            qparams, pix)

# numerics cross-check on the valid rows (one small batch keeps it cheap)
if mode == "check":
    small = pix[:4]
    a = siglip.forward(qparams, cfg, small, fused_oproj=True)
    b = siglip.forward(qparams, cfg, small, fused_oproj=False)
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    r = float(jnp.sqrt(jnp.mean((a - b).astype(jnp.float32) ** 2))
              / jnp.sqrt(jnp.mean(b.astype(jnp.float32) ** 2)))
    print(f"max abs diff {d:.4f}, rel rms {r:.5f}")
