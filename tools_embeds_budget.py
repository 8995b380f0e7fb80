"""Sub-stage budget of build_video_embeds (the 28 ms 'embeds' stage):
progressively larger prefixes on fixed pooled features."""
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import memory as memory_mod
from memory_augmented_vlm_tpu.models import siglip, vlm

cfg = VLMConfig.onevision_0_5b()
cfg = dataclasses.replace(
    cfg, pipeline=dataclasses.replace(cfg.pipeline, tower_int8=True))
params = vlm.init_params(cfg, jax.random.key(0), jnp.bfloat16)
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((64, 196, cfg.lm.hidden_size)) * 0.1,
                    jnp.bfloat16)
frame_idx = jnp.arange(64)
frame_valid = jnp.ones((64,), bool)
fine_idx = jnp.asarray(vlm.fine_frame_indices(64, cfg.memory.num_fine_frames))
nseg = 64 // cfg.memory.segment_frames


def s_pe(params, feats):
    return vlm.add_temporal_pe(params["positional_encoding"], feats, frame_idx)


def s_mem(params, feats):
    f = vlm.add_temporal_pe(params["positional_encoding"], feats, frame_idx)
    st = memory_mod.run_video(
        params["memory"]["recurrent_memory_transformer"], cfg.memory, f,
        frame_valid)
    return st.cache


def s_fuse(params, feats):
    f = vlm.add_temporal_pe(params["positional_encoding"], feats, frame_idx)
    st = memory_mod.run_video(
        params["memory"]["recurrent_memory_transformer"], cfg.memory, f,
        frame_valid)
    fused, _ = memory_mod.fuse_memory_bank(params["memory"]["memory_fuser"], st)
    return fused


def s_full(params, feats):
    return vlm.build_video_embeds(params, cfg, feats, frame_idx, frame_valid,
                                  fine_idx, nseg=nseg)


def timeit(name, fn):
    f = jax.jit(fn)
    out = f(params, feats)
    jax.block_until_ready(out)
    best = 1e9
    for i in range(4):
        f0 = feats + jnp.bfloat16(1e-3 * (i + 1))
        t0 = time.perf_counter()
        out = f(params, f0)
        leaf = jax.tree.leaves(out)[0]
        _ = float(jnp.sum(leaf[..., :1].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return best


t0 = timeit("temporal PE              ", s_pe)
t1 = timeit("+ memory (run_video)     ", s_mem)
t2 = timeit("+ fuser MLP              ", s_fuse)
t3 = timeit("full build_video_embeds  ", s_full)
print(f"deltas: pe {t0*1e3:.0f} | mem {(t1-t0)*1e3:.0f} | "
      f"fuse {(t2-t1)*1e3:.0f} | merge/prompts {(t3-t2)*1e3:.0f}", flush=True)
