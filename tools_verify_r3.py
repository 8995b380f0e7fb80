"""Verify drive: fused int8 SigLIP path + EVA-CLIP tower on the real TPU."""
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from memory_augmented_vlm_tpu.config import VisionConfig
from memory_augmented_vlm_tpu.models import siglip
from memory_augmented_vlm_tpu.models.encoders import build_vision_tower

# --- SigLIP int8 fused-MLP path vs oracle (unfused int8) ---
cfg = VisionConfig(hidden_size=256, intermediate_size=512,
                   num_hidden_layers=3, num_attention_heads=4,
                   image_size=112, patch_size=14)
params = siglip.init_params(cfg, jax.random.key(0), jnp.float32)
qparams = siglip.prequantize_int8(params)
rng = np.random.default_rng(0)
pix = jnp.asarray(rng.standard_normal((8, 112, 112, 3)), jnp.float32)

fused = jax.jit(lambda p, x: siglip.forward(p, cfg, x, int8=True))(qparams, pix)
fused = np.asarray(fused, np.float32)
print("fused int8 tower out:", fused.shape, "finite:", np.isfinite(fused).all(),
      flush=True)

# oracle: per-layer unfused (b*s < 256 would route around the kernel; here
# b*s = 8*64 = 512 >= 256 so the Pallas fused block IS engaged on TPU).
ref = jax.jit(lambda p, x: siglip.forward(p, cfg, x))(params, pix)
ref = np.asarray(ref, np.float32)
rel = np.abs(fused - ref).mean() / (np.abs(ref).mean() + 1e-9)
print(f"fused-int8 vs bf-float rel err: {rel:.4f}", flush=True)
assert rel < 0.1, rel  # int8 quantization class

# --- EVA-CLIP through the registry dispatch ---
tower = build_vision_tower("eva02-clip-l-14-336")
import dataclasses
small = dataclasses.replace(tower.config, width=128, layers=2, head_width=32,
                            image_size=56, patch_size=14)
from memory_augmented_vlm_tpu.models import eva_clip
ep = eva_clip.init_params(small, jax.random.key(1), jnp.float32)
epix = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), jnp.float32)
eout = jax.jit(lambda p, x: eva_clip.forward(p, small, x))(ep, epix)
eout = np.asarray(eout, np.float32)
print("eva tower out:", eout.shape, "finite:", np.isfinite(eout).all(),
      flush=True)
assert eout.shape == (2, (56 // 14) ** 2, 128)
print("VERIFY OK", flush=True)
