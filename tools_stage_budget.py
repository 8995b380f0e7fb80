"""Stage budget at HEAD by in-graph differencing: progressively larger
prefixes of the headline pipeline, each compiled whole and timed with a
forced scalar fetch (relay-safe). --serving_int8 measures the qualified
full-int8 serving config (lm_int8 + int8 unembed + kv_int8)."""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import bench
from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2, siglip, vlm

SERVING_INT8 = "--serving_int8" in sys.argv

cfg = VLMConfig.onevision_0_5b()
cfg = dataclasses.replace(
    cfg, pipeline=dataclasses.replace(cfg.pipeline, tower_int8=True))
params = vlm.init_params(cfg, jax.random.key(0), jnp.bfloat16)
params["vision_tower"] = siglip.prequantize_int8(params["vision_tower"])
if SERVING_INT8:
    params["language_model"] = qwen2.prequantize_int8(
        params["language_model"], include_unembed=True)
rng = np.random.default_rng(0)
pixels = jnp.asarray(rng.standard_normal((64, 384, 384, 3)), jnp.bfloat16)
tb = jnp.asarray([151644, 872, 198], jnp.int32)
ta = jnp.asarray([3838, 374, 12482, 304, 419, 2766, 30, 151645, 198,
                  151644, 77091, 198], jnp.int32)

nseg = 64 // cfg.memory.segment_frames
fine_idx = jnp.asarray(vlm.fine_frame_indices(64, cfg.memory.num_fine_frames))
frame_idx = jnp.arange(64)
frame_valid = jnp.ones((64,), bool)
MAX_NEW = 32


def stage_tower(params, pixels, tb, ta):
    return vlm.encode_frames(params, cfg, pixels)


def stage_visual(params, pixels, tb, ta):
    feats = vlm.encode_frames(params, cfg, pixels)
    return vlm.build_video_embeds(params, cfg, feats, frame_idx, frame_valid,
                                  fine_idx, nseg=nseg)


def stage_prefill(params, pixels, tb, ta):
    feats = vlm.encode_frames(params, cfg, pixels)
    visual = vlm.build_video_embeds(params, cfg, feats, frame_idx, frame_valid,
                                    fine_idx, nseg=nseg)
    embeds = vlm.splice_image_embeds(params, tb, visual, ta)
    s = embeds.shape[0]
    smax = ((s + 127) // 128) * 128
    padded = jnp.pad(embeds, ((0, smax - s), (0, 0)))[None]
    valid = jnp.asarray([s], jnp.int32)
    hidden, cache = qwen2.forward(
        params["language_model"], cfg.lm, padded,
        jnp.broadcast_to(jnp.arange(smax)[None], (1, smax)),
        valid_len=valid, cache_max_len=smax + MAX_NEW,
    )
    return hidden


full, _ = bench.build_pipeline(cfg, kv_int8=SERVING_INT8)


def stage_full(params, pixels, tb, ta):
    return full(params, pixels, tb, ta)


def timeit(name, fn):
    f = jax.jit(fn)
    out = f(params, pixels, tb, ta)
    jax.block_until_ready(out)
    best = 1e9
    for i in range(4):
        p0 = pixels + jnp.bfloat16(1e-3 * (i + 1))
        t0 = time.perf_counter()
        out = f(params, p0, tb, ta)
        leaf = jax.tree.leaves(out)[0]
        _ = float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return best


t1 = timeit("tower+proj+pool (encode_frames)", stage_tower)
t2 = timeit("+ video embeds (pe+mem+fuse)   ", stage_visual)
t3 = timeit("+ splice + prefill             ", stage_prefill)
t4 = timeit("full (+32-tok decode)          ", stage_full)
print(f"deltas: encode {t1*1e3:.0f} | embeds {(t2-t1)*1e3:.0f} | "
      f"prefill {(t3-t2)*1e3:.0f} | decode {(t4-t3)*1e3:.0f}", flush=True)
