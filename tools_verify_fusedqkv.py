"""Verify drive: fused-QKV int8 tower (now default) vs composed, real TPU."""
import numpy as np
import jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
from memory_augmented_vlm_tpu.config import VisionConfig
from memory_augmented_vlm_tpu.models import siglip

cfg = VisionConfig()
params = siglip.init_params(cfg, jax.random.key(0), jnp.bfloat16)
qparams = siglip.prequantize_int8(params)
pix = jnp.asarray(np.random.default_rng(0).standard_normal((64, 384, 384, 3)), jnp.bfloat16)
fused = jax.jit(lambda p, x: siglip.forward(p, cfg, x))(qparams, pix)
comp = jax.jit(lambda p, x: siglip.forward(p, cfg, x, fused_qkv=False))(qparams, pix)
a, b = np.asarray(fused, np.float32), np.asarray(comp, np.float32)
rel = np.abs(a - b).std() / b.std()
print(f"fused-vs-composed rel rms {rel:.2e}", flush=True)
assert np.isfinite(a).all() and rel < 2e-2, rel
print("VERIFY OK", flush=True)
