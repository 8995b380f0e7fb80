"""IN-CONTEXT sweep of the prefill flash blocks + scoped-VMEM limit on the
full headline pipeline: the round-5 trace shows the causal flash at
3.0 ms/layer in context vs 2.47 standalone, so the standalone optimum
(512/1024, tools_prefill_attn_sweep.py) may not hold inside the compiled
pipeline — the same lesson as the tower merge kernel's bq."""
import dataclasses
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2, siglip, vlm
from memory_augmented_vlm_tpu.ops import pallas_flash
from bench import build_pipeline

cfg = VLMConfig.onevision_0_5b()
cfg = dataclasses.replace(
    cfg, pipeline=dataclasses.replace(cfg.pipeline, tower_int8=True))
params = vlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
params["vision_tower"] = siglip.prequantize_int8(params["vision_tower"])
params["language_model"] = qwen2.prequantize_int8(
    params["language_model"], include_unembed=True)
pipeline, _ = build_pipeline(cfg, 64, kv_int8=True)

rng = np.random.default_rng(0)
pixels = jnp.asarray(rng.standard_normal((64, 384, 384, 3)), jnp.bfloat16)
tb = jnp.asarray([151644, 872, 198], jnp.int32)
ta = jnp.asarray([3838, 374, 12482, 304, 419, 2766, 30, 151645, 198,
                  151644, 77091, 198], jnp.int32)

orig = pallas_flash.pallas_flash_attention

for bq, bk, vmem in ((512, 1024, None), (512, 1024, 64 << 20),
                     (256, 1024, None), (512, 2048, 64 << 20),
                     (1024, 1024, 64 << 20), (512, 512, None)):
    pallas_flash.pallas_flash_attention = functools.partial(
        orig, block_q=bq, block_k=bk, vmem_limit_bytes=vmem)
    try:
        f = jax.jit(pipeline)
        tokens, _ = f(params, pixels, tb, ta)
        jax.block_until_ready(tokens)
        best = 1e9
        for i in range(4):
            px = pixels + jnp.bfloat16(1e-3 * (i + 1))
            t0 = time.perf_counter()
            tokens, _ = f(params, px, tb, ta)
            jax.block_until_ready(tokens)
            best = min(best, time.perf_counter() - t0)
        print(f"prefill bq={bq} bk={bk} vmem={vmem and vmem >> 20}MB: "
              f"e2e {best*1e3:.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"prefill bq={bq} bk={bk}: FAILED {type(e).__name__}: "
              f"{str(e)[:140]}", flush=True)
pallas_flash.pallas_flash_attention = orig
