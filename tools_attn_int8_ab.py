"""In-context A/B of int8_scores in the tower merge-flash kernel: both
attention matmuls on the int8 MXU (the head_dim-72 contraction pads to 128
lanes either way, so the 2x int8 rate is the only remaining lever on
them). Also prints the tower-output drift vs the bf16-scores path —
the numerics gate input (same drift class as the int8 projections)."""
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
outs = {}
for tag, int8_scores in (("bf16 scores", False), ("int8 scores", True)):
    pallas_flash.flash_attention_merge_heads = functools.partial(
        orig, int8_scores=int8_scores)
    f = jax.jit(lambda p, px: vlm.encode_frames(p, cfg, px))
    out = f(params, pixels)
    jax.block_until_ready(out)
    outs[tag] = np.asarray(out[..., :64].astype(jnp.float32))
    best = 1e9
    for i in range(4):
        px = pixels + jnp.bfloat16(1e-3 * (i + 1))
        t0 = time.perf_counter()
        r = f(params, px)
        _ = float(jnp.sum(r[..., :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: tower {best*1e3:.1f} ms", flush=True)
pallas_flash.flash_attention_merge_heads = orig

a, b = outs["bf16 scores"], outs["int8 scores"]
rel = np.abs(a - b).std() / a.std()
print(f"tower-feature drift int8 vs bf16 scores: {rel*100:.2f}% RMS "
      f"(int8-projection class is ~2%)", flush=True)
