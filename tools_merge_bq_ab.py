"""In-context A/B of flash_attention_merge_heads block_q on the real
tower graph: the round-4 profiler trace shows the merge kernel at
3.58 ms/layer IN CONTEXT vs ~2.5 standalone (tower = 57% of e2e), so the
standalone sweep's optimum may not hold in-context."""
import dataclasses
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import siglip, vlm
from memory_augmented_vlm_tpu.ops import pallas_flash

cfg = VLMConfig.onevision_0_5b()
cfg = dataclasses.replace(
    cfg, pipeline=dataclasses.replace(cfg.pipeline, tower_int8=True))
params = vlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
params["vision_tower"] = siglip.prequantize_int8(params["vision_tower"])
rng = np.random.default_rng(0)
pixels = jnp.asarray(rng.standard_normal((64, 384, 384, 3)), jnp.bfloat16)

orig = pallas_flash.flash_attention_merge_heads

# (block_q, vmem_limit_bytes): bq > 192 needs the scoped-VMEM limit raised
# past the 16 MB default (v5e has 128 MB physical VMEM; double-buffered
# whole-axis K/V at head_dim 72 padded to 128 lanes dominates the budget).
for bq, vmem in ((128, None), (192, None), (256, 32 << 20), (384, 48 << 20),
                 (768, 64 << 20)):
    pallas_flash.flash_attention_merge_heads = functools.partial(
        orig, block_q=bq, vmem_limit_bytes=vmem)
    f = jax.jit(lambda p, px: vlm.encode_frames(p, cfg, px))
    out = f(params, pixels)
    jax.block_until_ready(out)
    best = 1e9
    for i in range(4):
        px = pixels + jnp.bfloat16(1e-3 * (i + 1))
        t0 = time.perf_counter()
        r = f(params, px)
        _ = float(jnp.sum(r[..., :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"merge block_q={bq} vmem={vmem}: tower {best*1e3:.1f} ms",
          flush=True)
pallas_flash.flash_attention_merge_heads = orig
