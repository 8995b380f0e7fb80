"""In-context A/B of the fused int8 SwiGLU LM kernel (qwen2._mlp_half) on
the headline pipeline: off vs block_m sweep. The prefill stage is ~110 ms
of the 0.40 s e2e at HEAD (trace), its XLA int8 MLP chain streaming the
(9.7k, 4864) intermediates through HBM."""
import dataclasses
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2, siglip, vlm
from memory_augmented_vlm_tpu.ops import pallas_mlp_int8
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

orig_blk = pallas_mlp_int8.fused_swiglu_block_int8
orig_half = qwen2._mlp_half


def fallback_half(lp, hidden, cfg_):
    x = qwen2._norm(hidden, lp["post_attention_layernorm"], cfg_)
    return hidden + qwen2._layer_mlp(lp, x, cfg_.mlp_act, cfg_)


def run(tag):
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
    print(f"{tag}: e2e {best*1e3:.1f} ms", flush=True)


qwen2._mlp_half = fallback_half
run("swiglu OFF (XLA int8 chain)")
qwen2._mlp_half = orig_half
qwen2.fused_swiglu_enabled = True
for bm, vmem in ((128, 32 << 20), (256, 64 << 20), (512, 96 << 20),
                 (1024, 110 << 20)):
    pallas_mlp_int8.fused_swiglu_block_int8 = functools.partial(
        orig_blk, block_m=bm, vmem_limit_bytes=vmem)
    try:
        run(f"swiglu block_m={bm} vmem={vmem >> 20}MB")
    except Exception as e:  # noqa: BLE001
        print(f"swiglu block_m={bm}: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
pallas_mlp_int8.fused_swiglu_block_int8 = orig_blk
