"""Secondary benchmark: pipelined clip->answer THROUGHPUT.

The headline `bench.py` measures single-clip latency; this measures sustained
clips/sec over a stream of clips with host-side decode/preprocess overlapped
against device compute (the SURVEY §7 "tower never starves the LM"
requirement) — the serving/eval steady state.

`--synthetic-producer` (VERDICT round-3 item 6) drops the host-PIL rows
entirely: clips are pre-staged device tensors, so the reported clips/s is
device-bound BY CONSTRUCTION and reproducible on a host-poor box (round-3's
host-overlapped number regressed 2x purely from a slow 1-core host that
session). Without the flag, host-overlapped and serial rows are measured
too and the pipelined number is the headline.

Prints one JSON line (not the driver metric). vs_baseline compares
clips/s against the modeled A100 single-clip pipeline run back-to-back
(bench.py's 16.5k visual tok/s => ~1.75 clips/s at 9429 tokens/clip).
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from queue import Queue

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.data.preprocessing import SigLipImageProcessor
from bench import (
    A100_BASELINE_VISUAL_TOKENS_PER_S,
    MAX_NEW_TOKENS,
    NUM_FRAMES,
    build_pipeline,
)
from memory_augmented_vlm_tpu.models import qwen2, vlm

NUM_CLIPS = 8
VISUAL_TOKENS_PER_CLIP = 9429


def main():
    import dataclasses

    from memory_augmented_vlm_tpu.models import siglip

    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic-producer", action="store_true",
                    help="pre-staged device tensors, zero host decode: the "
                    "device-bound sustained number (reproducible regardless "
                    "of host speed)")
    args = ap.parse_args()

    cfg = VLMConfig.onevision_0_5b()
    # same serving config as the headline bench: int8 tower + the
    # qualified full-int8 LM (int8 unembed + int8 KV)
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, tower_int8=True))
    params = vlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    params["vision_tower"] = siglip.prequantize_int8(params["vision_tower"])
    params["language_model"] = qwen2.prequantize_int8(
        params["language_model"], include_unembed=True)
    pipeline, _ = build_pipeline(cfg, kv_int8=True)
    fn = jax.jit(pipeline)

    rng = np.random.default_rng(0)
    # synthetic decoded frames (uint8, pre-preprocess) per clip
    raw_clips = [rng.integers(0, 255, (NUM_FRAMES, 384, 384, 3), dtype=np.uint8)
                 for _ in range(NUM_CLIPS)]
    processor = SigLipImageProcessor()
    text_before = jnp.asarray([151644, 872, 198], jnp.int32)
    text_after = jnp.asarray([3838, 374, 12482, 304, 419, 2766, 30], jnp.int32)

    # warmup/compile
    warm = jnp.asarray(processor.preprocess(raw_clips[0]), jnp.bfloat16)
    out, _ = fn(params, warm, text_before, text_after)
    jax.block_until_ready(out)

    def run(pipelined: bool) -> float:
        t0 = time.perf_counter()
        if pipelined:
            # single producer thread: host preprocess overlaps device compute
            # (this box has nproc=1 — more workers just thrash; on real hosts
            # scale workers to cores or use the native loader for tensors)
            q: Queue = Queue(maxsize=2)

            def producer():
                for clip in raw_clips:
                    q.put(jnp.asarray(processor.preprocess(clip), jnp.bfloat16))
                q.put(None)

            threading.Thread(target=producer, daemon=True).start()
            results = []
            while True:
                pixels = q.get()
                if pixels is None:
                    break
                results.append(fn(params, pixels, text_before, text_after)[0])
            jax.block_until_ready(results)
        else:
            for clip in raw_clips:
                pixels = jnp.asarray(processor.preprocess(clip), jnp.bfloat16)
                out, _ = fn(params, pixels, text_before, text_after)
                jax.block_until_ready(out)
        return time.perf_counter() - t0

    def run_device_bound() -> float:
        """Clip pipelining with pre-extracted tensors (the native-loader
        serving path, tools/extract_frames.py): successive clips' whole
        graphs are dispatched ASYNCHRONOUSLY so clip i+1's tower work is
        already queued on-device while clip i prefills/decodes — the
        single-chip realization of "the vision encoder never starves the
        LM" (one chip serializes stages on the MXU, so overlap here means
        zero host-sync gaps between clips; multi-chip splits stages across
        the mesh instead). Queue depth 2 bounds live buffers."""
        tensors = [jnp.asarray(processor.preprocess(c), jnp.bfloat16)
                   for c in raw_clips]
        jax.block_until_ready(tensors)
        t0 = time.perf_counter()
        inflight = []
        results = []
        for px in tensors:
            inflight.append(fn(params, px, text_before, text_after)[0])
            if len(inflight) > 2:
                results.append(np.asarray(inflight.pop(0)))  # forced fetch
        results.extend(np.asarray(r) for r in inflight)
        return time.perf_counter() - t0

    def run_device_preprocess() -> float:
        """Host ships RAW uint8 frames; bicubic resize + normalize run
        inside the same jit as the tower (ops/preprocess.py). Kills the
        per-frame host PIL loop — the sustained-throughput limiter on a
        host-poor box — and halves the transfer bytes vs bf16."""
        from memory_augmented_vlm_tpu.ops.preprocess import preprocess_frames

        def raw_pipeline(params, raw_u8, tb, ta):
            px = preprocess_frames(raw_u8, size=processor.size,
                                   dtype=jnp.bfloat16)
            return pipeline(params, px, tb, ta)

        fn_raw = jax.jit(raw_pipeline)
        out, _ = fn_raw(params, jnp.asarray(raw_clips[0]), text_before,
                        text_after)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        inflight = []
        results = []
        for clip in raw_clips:
            inflight.append(
                fn_raw(params, jnp.asarray(clip), text_before, text_after)[0])
            if len(inflight) > 2:
                results.append(np.asarray(inflight.pop(0)))  # forced fetch
        results.extend(np.asarray(r) for r in inflight)
        return time.perf_counter() - t0

    baseline_clips_per_s = (A100_BASELINE_VISUAL_TOKENS_PER_S
                            / VISUAL_TOKENS_PER_CLIP)
    if args.synthetic_producer:
        # device-bound by construction: two device-only modes, no host rows
        t_dev = run_device_bound()
        t_devprep = run_device_preprocess()
        clips_per_s = NUM_CLIPS / t_dev
        print(json.dumps({
            "metric": "sustained_clips_per_s_64frame_0.5b_synthetic_producer",
            "value": round(clips_per_s, 3),
            "unit": "clips/s",
            "vs_baseline": round(clips_per_s / baseline_clips_per_s, 3),
            "detail": {
                "device_bound_s_per_clip": round(t_dev / NUM_CLIPS, 3),
                "device_preprocess_clips_per_s": round(NUM_CLIPS / t_devprep, 3),
                "device_preprocess_s_per_clip": round(t_devprep / NUM_CLIPS, 3),
                "clips": NUM_CLIPS,
            },
        }))
        return

    t_serial = run(pipelined=False)
    t_piped = run(pipelined=True)
    t_dev = run_device_bound()
    t_devprep = run_device_preprocess()
    print(json.dumps({
        "metric": "pipelined_clip_throughput_64frame_0.5b",
        "value": round(NUM_CLIPS / t_piped, 3),
        "unit": "clips/s",
        "vs_baseline": round((NUM_CLIPS / t_piped) / baseline_clips_per_s, 3),
        "detail": {
            "serial_s_per_clip": round(t_serial / NUM_CLIPS, 3),
            "pipelined_speedup_vs_serial": round(t_serial / t_piped, 3),
            "pipelined_s_per_clip": round(t_piped / NUM_CLIPS, 3),
            "device_bound_clips_per_s": round(NUM_CLIPS / t_dev, 3),
            "device_bound_s_per_clip": round(t_dev / NUM_CLIPS, 3),
            "device_preprocess_clips_per_s": round(NUM_CLIPS / t_devprep, 3),
            "device_preprocess_s_per_clip": round(t_devprep / NUM_CLIPS, 3),
            "clips": NUM_CLIPS,
        },
    }))


if __name__ == "__main__":
    main()
