"""Verify the gated fused_oproj tower path compiles + runs in-context on
the real chip at block_q=64 (the scoped-VMEM fix), small frame count."""
import numpy as np
import jax, jax.numpy as jnp
from memory_augmented_vlm_tpu.config import VisionConfig
from memory_augmented_vlm_tpu.models import siglip

cfg = VisionConfig()
params = siglip.prequantize_int8(
    siglip.init_params(cfg, jax.random.key(0), jnp.bfloat16))
pix = jnp.asarray(np.random.default_rng(0).standard_normal((8, 384, 384, 3)),
                  jnp.bfloat16)
f = jax.jit(lambda p, x: siglip.forward(p, cfg, x, fused_oproj=True))
out = f(params, pix)
print("fused_oproj out:", out.shape, out.dtype,
      float(jnp.mean(jnp.abs(out.astype(jnp.float32)))))
g = jax.jit(lambda p, x: siglip.forward(p, cfg, x))
ref = g(params, pix)
err = float(jnp.max(jnp.abs((out - ref).astype(jnp.float32))))
scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
print("max |fused - default|:", err, "max |ref|:", scale)
