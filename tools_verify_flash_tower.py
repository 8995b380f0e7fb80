"""Verify drive: flash-attention tower path on the real TPU.

Drives siglip.forward (public tower surface) at a shape that engages the
flash branch (b*s >= 4096, s=729 -> block 768), for bf16 and int8 params,
and compares against the XLA mha path (CPU-equivalent math) on-device.
"""
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"

from memory_augmented_vlm_tpu.config import VisionConfig
from memory_augmented_vlm_tpu.models import siglip

# 3-layer tower at REAL patch geometry (384 -> 729 patches) so the flash
# branch runs with block 768; small depth keeps compile quick.
cfg = VisionConfig(num_hidden_layers=4)  # num_used_layers = 3
assert cfg.num_patches == 729
params = siglip.init_params(cfg, jax.random.key(0), jnp.bfloat16)
qparams = siglip.prequantize_int8(params)
rng = np.random.default_rng(0)
pix = jnp.asarray(rng.standard_normal((8, 384, 384, 3)), jnp.bfloat16)

# flash branch engaged: b*s = 8*729 = 5832 >= 4096
flash = jax.jit(lambda p, x: siglip.forward(p, cfg, x))(params, pix)
flash = np.asarray(flash, np.float32)
print("bf16 flash tower out:", flash.shape, "finite:",
      bool(np.isfinite(flash).all()), flush=True)

# oracle: same params, XLA mha path (force by dropping below the gate)
half = jax.jit(lambda p, x: siglip.forward(p, cfg, x))(params, pix[:4])
ref = np.asarray(half, np.float32)

# mha oracle at the same batch: monkey-free route — call with b*s < 4096
mha_small = jax.jit(lambda p, x: siglip.forward(p, cfg, x))(params, pix[:5])
ref5 = np.asarray(mha_small, np.float32)  # 5*729=3645 < 4096 -> XLA path
rel = np.abs(flash[:5] - ref5).mean() / (np.abs(ref5).mean() + 1e-9)
print(f"flash vs XLA-mha rel err (bf16): {rel:.5f}", flush=True)
assert rel < 2e-2, rel  # bf16-MXU class

# int8 path with flash
qout = jax.jit(lambda p, x: siglip.forward(p, cfg, x))(qparams, pix)
qout = np.asarray(qout, np.float32)
rel_q = np.abs(qout[:5] - ref5).mean() / (np.abs(ref5).mean() + 1e-9)
print("int8 flash tower out finite:", bool(np.isfinite(qout).all()),
      f"rel err vs bf16-mha: {rel_q:.5f}", flush=True)
assert rel_q < 6e-2, rel_q  # int8 quantization class

# fused_mlp=True A/B flag still functional on the int8 path
fused = jax.jit(lambda p, x: siglip.forward(p, cfg, x, fused_mlp=True))(
    qparams, pix)
fused = np.asarray(fused, np.float32)
rel_f = np.abs(fused - qout).mean() / (np.abs(qout).mean() + 1e-9)
print(f"fused_mlp flag path rel err vs unfused int8: {rel_f:.5f}", flush=True)
assert rel_f < 3e-2, rel_f

print("VERIFY OK", flush=True)
