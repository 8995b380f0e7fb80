"""Headline benchmark: end-to-end 64-frame clip -> answer on the flagship
video pipeline (BASELINE.json metric), run on real TPU.

Measures visual tokens/sec through the full spine: SigLIP tower over 64
frames -> projector -> 2x2 pool -> temporal PE -> recurrent memory (2
segments) -> fuse -> prompt splice -> Qwen2-0.5B prefill -> 32-token greedy
decode.

`vs_baseline` compares against an analytic HF+flash-attn-2 A100 estimate for
the same 0.5B pipeline (BASELINE.md records that the reference publishes no
numbers, so the baseline must be modeled): ~62 TFLOPs total (SigLIP-SO400M
~0.81 TF/frame x 64 + 0.5B prefill over ~9.4k tokens + decode) at 35% MFU on
312 TFLOP/s bf16 => ~0.57 s => ~16.5k visual tokens/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2, vlm

A100_BASELINE_VISUAL_TOKENS_PER_S = 16500.0
# 7B analytic baseline (same modeling): tower ~52 TF + 7B prefill over ~9.4k
# tokens (2 * 7.6e9 * 9.4e3 ~ 143 TF) at 35% MFU on 312 TF/s bf16 ~ 1.79 s,
# + 32 decode steps at ~12 ms/token (HBM-bound, 15.2 GB weights / 2 TB/s
# with flash-attn-2 overheads) ~ 0.38 s => ~2.17 s => ~4.3k visual tokens/s
A100_BASELINE_7B_VISUAL_TOKENS_PER_S = 4300.0

NUM_FRAMES = 64
MAX_NEW_TOKENS = 32


def baseline_visual_tokens_per_s(num_frames: int, model: str = "0.5b",
                                 no_memory: bool = False) -> float:
    """Generalize the modeled A100 baseline to other frame counts
    (BASELINE.json configs 2-5 span 16-128 frames).

    Same model as the 64-frame headline constants: SigLIP-SO400M ~0.81
    TF/frame + LM prefill (2 * n_params * S FLOPs, S = 1568*ceil(F/32)
    memory tokens + 6272 fine + text) at 35% MFU on 312 TF/s bf16, plus 32
    HBM-bound decode steps (~10 ms at 0.5B, ~380 ms at 7B: 15.2 GB weights
    / 2 TB/s + flash-attn-2 overheads). Returns exactly the pinned headline
    constants at 64 frames.
    """
    if num_frames == NUM_FRAMES and not no_memory:
        return (A100_BASELINE_7B_VISUAL_TOKENS_PER_S if model == "7b"
                else A100_BASELINE_VISUAL_TOKENS_PER_S)
    if no_memory:
        # plain pooled video branch: 196 + newline per frame + text
        s_tokens = 197 * num_frames + 15
    else:
        nseg = min((num_frames + 31) // 32, 10)  # ring cache caps at 10
        # 8*196 memory tokens/segment + 196/fine frame + vis prompts + text
        s_tokens = 1568 * nseg + 196 * min(32, num_frames) + 36
    n_params = 7.6e9 if model == "7b" else 0.5e9
    tf = 0.81 * num_frames + 2 * n_params * s_tokens / 1e12
    decode_s = 0.38 if model == "7b" else 0.010
    time_s = tf / (312.0 * 0.35) + decode_s
    return (s_tokens - 15) / time_s


def build_pipeline(cfg: VLMConfig, num_frames: int = NUM_FRAMES,
                   no_memory: bool = False, kv_int8: bool = False,
                   return_prefill_logits: bool = False,
                   max_new_tokens: int = MAX_NEW_TOKENS,
                   sample_temperature: float = 0.0):
    # frames pad to the 32-frame segment multiple with a validity mask, the
    # same contract as vlm.video_qa_embeds (16-frame short clips run one
    # partially-valid segment)
    fmax = vlm.pad_frames_to_segment_multiple(
        num_frames, cfg.memory.segment_frames)
    # >cache_cap segments overflow the ring cache: the memory stream keeps
    # the LAST cap segment memories (MemoryController.py:152-154 sliding
    # window), so the spliced length clamps at cap (video_qa_embeds does
    # the same; exercised by --frames > 320)
    nseg = min(fmax // cfg.memory.segment_frames, cfg.memory.cache_cap)
    fine_idx = jnp.asarray(vlm.fine_frame_indices(num_frames, cfg.memory.num_fine_frames))
    frame_idx = jnp.arange(fmax)
    frame_valid = jnp.arange(fmax) < num_frames

    def clip_to_answer(params, pixels, text_before, text_after):
        feats = vlm.encode_frames(params, cfg, pixels)  # (num_frames, 196, H)
        if no_memory:
            # BASELINE.json config 2: baseline frame pooling, no memory
            # module — pooled per-frame features with image_newline rows
            # (the reference's plain video branch, llava_arch.py:583-634)
            visual = vlm.add_token_per_frame(
                feats, params["memory"]["image_newline"])
        else:
            if fmax != num_frames:  # tower runs real frames; features pad
                feats = jnp.pad(
                    feats, ((0, fmax - num_frames), (0, 0), (0, 0)))
            visual = vlm.build_video_embeds(
                params, cfg, feats, frame_idx, frame_valid, fine_idx,
                nseg=nseg,
            )
        embeds = vlm.splice_image_embeds(params, text_before, visual, text_after)
        s = embeds.shape[0]
        smax = ((s + 127) // 128) * 128
        padded = jnp.pad(embeds, ((0, smax - s), (0, 0)))[None]
        valid = jnp.asarray([s], jnp.int32)
        hidden, cache = qwen2.forward(
            params["language_model"], cfg.lm, padded,
            jnp.broadcast_to(jnp.arange(smax)[None], (1, smax)),
            valid_len=valid, cache_max_len=smax + max_new_tokens,
            # the spliced length is a static shape here, so the prefill
            # flash kernel can fold its valid-length scalar work away
            static_valid_len=s,
        )
        last = jnp.take_along_axis(hidden, (valid - 1)[:, None, None], axis=1)
        logits = qwen2.unembed(params["language_model"], cfg.lm, last)[:, 0]
        if kv_int8:
            # serving config: int8 KV halves the per-step cache read (the
            # 9.7k-token context cache rivals the weight stream at 0.5B)
            cache = qwen2.quantize_cache(cache)

        def body(carry, step_key):
            logits, cache = carry
            if sample_temperature > 0.0:
                # Gumbel-max sampling with a per-step key: two configs run
                # with IDENTICAL noise, so token agreement isolates the
                # quantization logit drift (tools_int8_qualify.py --sampled)
                g = jax.random.gumbel(step_key, logits.shape, jnp.float32)
                tok = jnp.argmax(
                    logits.astype(jnp.float32) / sample_temperature + g,
                    axis=-1).astype(jnp.int32)
            else:
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emb = qwen2.embed_tokens(params["language_model"], tok[:, None], cfg.lm).astype(padded.dtype)
            hidden, cache = qwen2.decode_step(params["language_model"], cfg.lm, emb, cache)
            logits = qwen2.unembed(params["language_model"], cfg.lm, hidden)[:, 0]
            return (logits, cache), tok

        step_keys = jax.random.split(jax.random.key(0), max_new_tokens)
        (_, _), tokens = jax.lax.scan(body, (logits, cache), step_keys)
        if return_prefill_logits:
            # multichip dryruns compare layouts on pre-argmax logits when a
            # greedy token diverges (fp-tie diagnosis, not a sharding bug)
            return tokens, s, logits
        return tokens, s

    return clip_to_answer, nseg


def _init_lm_7b_int8(cfg_lm, key):
    """Random 7B LM directly in serving load_8bit form.

    The bf16 7B model (15.2 GB) cannot be materialized beside its int8 copy
    on a 16 GB chip, so the dense layer kernels are generated as random int8
    with a constant per-channel scale (0.02/127 => dequantized weights in
    the same 0.02-std class as the bf16 init); embeddings / lm_head / norms
    stay bf16 like `qwen2.prequantize_int8`."""
    L, H, I = cfg_lm.num_hidden_layers, cfg_lm.hidden_size, cfg_lm.intermediate_size
    NH, NKV, D = (cfg_lm.num_attention_heads, cfg_lm.num_key_value_heads,
                  cfg_lm.head_dim)
    ks = iter(jax.random.split(key, 12))

    def ri8(shape):
        return jax.random.randint(next(ks), shape, -127, 128, dtype=jnp.int8)

    def q(shape, bias=False):
        entry = {"kernel_int8": ri8(shape),
                 "scale": jnp.full(shape[:1] + shape[2:], 0.02 / 127,
                                   jnp.float32)}
        if bias:
            entry["bias"] = jnp.zeros(shape[:1] + shape[2:], jnp.bfloat16)
        return entry

    def dense(shape):
        return (jax.random.normal(next(ks), shape) * 0.02).astype(jnp.bfloat16)

    return {
        "embed_tokens": dense((cfg_lm.vocab_size, H)),
        "layers": {
            "input_layernorm": jnp.ones((L, H), jnp.bfloat16),
            "post_attention_layernorm": jnp.ones((L, H), jnp.bfloat16),
            "q_proj": q((L, H, NH * D), bias=True),
            "k_proj": q((L, H, NKV * D), bias=True),
            "v_proj": q((L, H, NKV * D), bias=True),
            "o_proj": q((L, NH * D, H)),
            "gate_proj": q((L, H, I)),
            "up_proj": q((L, H, I)),
            "down_proj": q((L, I, H)),
        },
        "norm": jnp.ones((H,), jnp.bfloat16),
        "lm_head": dense((H, cfg_lm.vocab_size)),
    }


def main():
    import argparse
    import dataclasses

    from memory_augmented_vlm_tpu.models import siglip

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="0.5b", choices=["0.5b", "7b"])
    ap.add_argument("--bf16_lm", action="store_true",
                    help="0.5b only: serve the LM in bf16 instead of the "
                    "default full-int8 serving config (the reference's "
                    "load_8bit, builder.py:30-34 — numerics-qualified at "
                    "flagship size: 100%% greedy agreement over an 8-prompt "
                    "corpus, tools_int8_qualify.py + tests/test_quant.py; "
                    "promoted to the headline per that gate)")
    ap.add_argument("--frames", type=int, default=NUM_FRAMES,
                    help="clip length; BASELINE.json configs span 16-128 "
                    "(non-multiples of the 32-frame segment pad with a "
                    "validity mask, e.g. 16 runs one half-valid segment)")
    ap.add_argument("--no_memory", action="store_true",
                    help="BASELINE.json config 2: baseline frame pooling, "
                    "no memory module (plain pooled frames + image_newline)")
    args, _ = ap.parse_known_args()
    nframes = args.frames

    if args.model == "7b":
        # 7B headline geometry (BASELINE.json configs 3-5) in the load_8bit
        # serving mode — bf16 7B weights (15.2 GB) don't leave headroom for
        # the KV cache on one 16 GB v5e chip; int8 layer kernels (~7 GB) +
        # bf16 embeddings/unembed (~2.2 GB) do.
        cfg = VLMConfig.onevision_7b()
        cfg = dataclasses.replace(
            cfg, pipeline=dataclasses.replace(cfg.pipeline, tower_int8=True))
        # init everything except the LM at a throwaway 1-layer depth (the
        # int8 path is keyed purely off `kernel_int8` entries in the params)
        shallow = dataclasses.replace(
            cfg, lm=dataclasses.replace(cfg.lm, num_hidden_layers=1))
        params = vlm.init_params(shallow, jax.random.key(0), dtype=jnp.bfloat16)
        params["language_model"] = _init_lm_7b_int8(cfg.lm, jax.random.key(1))
        params["vision_tower"] = siglip.prequantize_int8(params["vision_tower"])
        pipeline, nseg = build_pipeline(cfg, nframes, no_memory=args.no_memory)
        metric_name = f"visual_tokens_per_s_{nframes}frame_clip_to_answer_7b_int8"
        if args.no_memory:
            metric_name += "_no_memory"
        baseline = baseline_visual_tokens_per_s(nframes, "7b",
                                                no_memory=args.no_memory)
    else:
        cfg = VLMConfig.onevision_0_5b()
        # serving config: frozen tower runs with static-scale prequantized int8
        # weights on the int8 MXU (the reference's load_8bit capability,
        # builder.py:30-34; measured 415 -> 345 ms for the 64-frame tower with
        # output drift in the same 1e-2 class as bf16-MXU, PERFORMANCE.md)
        cfg = dataclasses.replace(
            cfg, pipeline=dataclasses.replace(cfg.pipeline, tower_int8=True))
        params = vlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
        params["vision_tower"] = siglip.prequantize_int8(params["vision_tower"])
        metric_name = f"visual_tokens_per_s_{nframes}frame_clip_to_answer_0.5b"
        serving_int8 = not args.bf16_lm
        if serving_int8:
            # default: the qualified full-int8 serving config — int8 dense
            # kernels + int8 unembed + int8 KV cache (see --bf16_lm help)
            params["language_model"] = qwen2.prequantize_int8(
                params["language_model"], include_unembed=True)
            metric_name += "_lm_int8"
        if args.no_memory:
            metric_name += "_no_memory"
        pipeline, nseg = build_pipeline(cfg, nframes, no_memory=args.no_memory,
                                        kv_int8=serving_int8)
        baseline = baseline_visual_tokens_per_s(nframes, "0.5b",
                                                no_memory=args.no_memory)

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((nframes, 384, 384, 3)), jnp.bfloat16)
    text_before = jnp.asarray([151644, 872, 198], jnp.int32)
    text_after = jnp.asarray([3838, 374, 12482, 304, 419, 2766, 30, 151645, 198, 151644, 77091, 198], jnp.int32)

    fn = jax.jit(pipeline)
    # warmup / compile
    tokens, s = fn(params, pixels, text_before, text_after)
    jax.block_until_ready(tokens)
    n_visual = int(s) - len(text_before) - len(text_after)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        tokens, _ = fn(params, pixels, text_before, text_after)
        jax.block_until_ready(tokens)
        times.append(time.perf_counter() - t0)
    latency = min(times)
    visual_tok_per_s = n_visual / latency

    # this session's dispatch floor (one trivial jitted round trip — the
    # per-call relay overhead a real host pays ~1 ms for); the projected
    # row is reported as detail only, the headline stays the measured value
    tiny = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(tiny(jnp.zeros((8,), jnp.float32)))
    floors = []
    for i in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(tiny(jnp.full((8,), float(i), jnp.float32)))
        floors.append(time.perf_counter() - t0)
    floor_s = min(floors)
    projected_latency = max(latency - floor_s + 1e-3, 1e-3)

    print(json.dumps({
        "metric": metric_name,
        "value": round(visual_tok_per_s, 1),
        "unit": "visual tokens/s",
        "vs_baseline": round(visual_tok_per_s / baseline, 3),
        "detail": {
            "latency_s": round(latency, 4),
            "dispatch_floor_ms": round(floor_s * 1e3, 2),
            "projected_latency_s_1ms_dispatch": round(projected_latency, 4),
            "projected_vs_baseline_1ms_dispatch": round(
                n_visual / projected_latency / baseline, 3),
            "visual_tokens": n_visual,
            "frames": nframes,
            "segments": nseg,
            "decode_tokens": MAX_NEW_TOKENS,
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    # the remote-compile relay occasionally drops a request; one retry keeps
    # the driver's end-of-round bench record intact
    import sys
    import traceback

    for attempt in range(3):
        try:
            main()
            break
        except Exception:  # noqa: BLE001
            if attempt == 2:
                raise
            traceback.print_exc(file=sys.stderr)
            time.sleep(10)
