"""Qualify the full int8 serving config (lm_int8 + int8 unembed + kv_int8)
against the bf16-LM path at FLAGSHIP size on the real TPU: greedy token
agreement + answer-level exact match across a prompt corpus, and (round 5)
long decodes and common-noise sampled decoding.

This is the on-hardware half of the numerics gate (VERDICT.md round-3
item 1; the CPU corpus test is tests/test_quant.py::
test_serving_int8_greedy_agreement_and_logit_drift). Both halves must pass
before bench.py reports the int8 config as the serving headline. The
round-4 gate ran 8 prompts x 32 greedy tokens; the round-5 VERDICT asked
for >= 32 prompts x >= 128 tokens plus sampled decoding (item 5) — those
are the defaults below. Sampled decoding uses Gumbel-max with IDENTICAL
per-step noise in both configs, so disagreement isolates quantization
logit drift rather than sampler randomness.

Run: python tools_int8_qualify.py [--prompts 32] [--frames 64]
     [--decode 128] [--temperature 0.7]
(temperature 0 = greedy; the round-5 gate runs both.)
"""

from __future__ import annotations

import argparse
import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2, siglip, vlm

from bench import build_pipeline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", type=int, default=32)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--decode", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="0 = greedy; >0 = Gumbel-max sampling with common "
                    "noise across the two configs")
    args = ap.parse_args()

    cfg = VLMConfig.onevision_0_5b()
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, tower_int8=True))
    params = vlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    params["vision_tower"] = siglip.prequantize_int8(params["vision_tower"])
    qparams = dict(params)
    qparams["language_model"] = qwen2.prequantize_int8(
        params["language_model"], include_unembed=True)

    pipe_bf16 = jax.jit(build_pipeline(
        cfg, args.frames, max_new_tokens=args.decode,
        sample_temperature=args.temperature)[0])
    pipe_int8 = jax.jit(build_pipeline(
        cfg, args.frames, kv_int8=True, max_new_tokens=args.decode,
        sample_temperature=args.temperature)[0])

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.standard_normal((args.frames, 384, 384, 3)), jnp.bfloat16)
    text_before = jnp.asarray([151644, 872, 198], jnp.int32)

    agree, exact = [], 0
    for i in range(args.prompts):
        # vary the question tokens per prompt (also defeats the relay's
        # identical-execution cache)
        q_ids = rng.integers(10, 48000, size=(9,)).astype(np.int32)
        text_after = jnp.asarray(
            list(q_ids) + [30, 151645, 198, 151644, 77091, 198], jnp.int32)
        ref_toks, _ = pipe_bf16(params, pixels, text_before, text_after)
        got_toks, _ = pipe_int8(qparams, pixels, text_before, text_after)
        ref_toks, got_toks = np.asarray(ref_toks), np.asarray(got_toks)
        a = float((ref_toks == got_toks).mean())
        agree.append(a)
        exact += int(np.array_equal(ref_toks, got_toks))
        print(f"prompt {i}: agreement {a:.3f}", flush=True)

    out = {
        "metric": "int8_serving_token_agreement",
        "mode": ("greedy" if args.temperature == 0.0
                 else f"sampled_T{args.temperature}"),
        "prompts": args.prompts,
        "frames": args.frames,
        "decode_tokens": args.decode,
        "mean_agreement": round(float(np.mean(agree)), 4),
        "min_agreement": round(float(np.min(agree)), 4),
        "exact_answer_match": f"{exact}/{args.prompts}",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
