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

NUM_FRAMES = 64
MAX_NEW_TOKENS = 32


def build_pipeline(cfg: VLMConfig):
    nseg = NUM_FRAMES // cfg.memory.segment_frames
    fine_idx = jnp.asarray(vlm.fine_frame_indices(NUM_FRAMES, cfg.memory.num_fine_frames))
    frame_idx = jnp.arange(NUM_FRAMES)
    frame_valid = jnp.ones((NUM_FRAMES,), bool)

    def clip_to_answer(params, pixels, text_before, text_after):
        feats = vlm.encode_frames(params, cfg, pixels)
        visual = vlm.build_video_embeds(
            params, cfg, feats, frame_idx, frame_valid, fine_idx, nseg=nseg
        )
        embeds = vlm.splice_image_embeds(params, text_before, visual, text_after)
        s = embeds.shape[0]
        smax = ((s + 127) // 128) * 128
        padded = jnp.pad(embeds, ((0, smax - s), (0, 0)))[None]
        valid = jnp.asarray([s], jnp.int32)
        hidden, cache = qwen2.forward(
            params["language_model"], cfg.lm, padded,
            jnp.broadcast_to(jnp.arange(smax)[None], (1, smax)),
            valid_len=valid, cache_max_len=smax + MAX_NEW_TOKENS,
        )
        last = jnp.take_along_axis(hidden, (valid - 1)[:, None, None], axis=1)
        logits = qwen2.unembed(params["language_model"], cfg.lm, last)[:, 0]

        def body(carry, _):
            logits, cache = carry
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emb = qwen2.embed_tokens(params["language_model"], tok[:, None], cfg.lm).astype(padded.dtype)
            hidden, cache = qwen2.decode_step(params["language_model"], cfg.lm, emb, cache)
            logits = qwen2.unembed(params["language_model"], cfg.lm, hidden)[:, 0]
            return (logits, cache), tok

        (_, _), tokens = jax.lax.scan(body, (logits, cache), None, length=MAX_NEW_TOKENS)
        return tokens, s

    return clip_to_answer, nseg


def main():
    import dataclasses

    from memory_augmented_vlm_tpu.models import siglip

    cfg = VLMConfig.onevision_0_5b()
    # serving config: frozen tower runs with static-scale prequantized int8
    # weights on the int8 MXU (the reference's load_8bit capability,
    # builder.py:30-34; measured 415 -> 345 ms for the 64-frame tower with
    # output drift in the same 1e-2 class as bf16-MXU, PERFORMANCE.md)
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, tower_int8=True))
    params = vlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    params["vision_tower"] = siglip.prequantize_int8(params["vision_tower"])
    pipeline, nseg = build_pipeline(cfg)

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((NUM_FRAMES, 384, 384, 3)), jnp.bfloat16)
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

    print(json.dumps({
        "metric": "visual_tokens_per_s_64frame_clip_to_answer_0.5b",
        "value": round(visual_tok_per_s, 1),
        "unit": "visual tokens/s",
        "vs_baseline": round(visual_tok_per_s / A100_BASELINE_VISUAL_TOKENS_PER_S, 3),
        "detail": {
            "latency_s": round(latency, 4),
            "visual_tokens": n_visual,
            "frames": NUM_FRAMES,
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
