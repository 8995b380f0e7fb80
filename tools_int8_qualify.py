"""Qualify the full int8 serving config (lm_int8 + int8 unembed + kv_int8)
against the bf16-LM path at FLAGSHIP size on the real TPU: greedy token
agreement + prefill logit drift across a prompt corpus.

This is the on-hardware half of the numerics gate (VERDICT.md round-3 item 1;
the CPU corpus test is tests/test_quant.py::
test_serving_int8_greedy_agreement_and_logit_drift). Both halves must pass
before bench.py reports the int8 config as the serving headline.

Run: python tools_int8_qualify.py [--prompts 8] [--frames 64]
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

from bench import MAX_NEW_TOKENS, build_pipeline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", type=int, default=8)
    ap.add_argument("--frames", type=int, default=64)
    args = ap.parse_args()

    cfg = VLMConfig.onevision_0_5b()
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(cfg.pipeline, tower_int8=True))
    params = vlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    params["vision_tower"] = siglip.prequantize_int8(params["vision_tower"])
    qparams = dict(params)
    qparams["language_model"] = qwen2.prequantize_int8(
        params["language_model"], include_unembed=True)

    pipe_bf16 = jax.jit(build_pipeline(cfg, args.frames)[0])
    pipe_int8 = jax.jit(build_pipeline(cfg, args.frames, kv_int8=True)[0])

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.standard_normal((args.frames, 384, 384, 3)), jnp.bfloat16)
    text_before = jnp.asarray([151644, 872, 198], jnp.int32)

    agree = []
    for i in range(args.prompts):
        # vary the question tokens per prompt (also defeats the relay's
        # identical-execution cache)
        q_ids = rng.integers(10, 48000, size=(9,)).astype(np.int32)
        text_after = jnp.asarray(
            list(q_ids) + [30, 151645, 198, 151644, 77091, 198], jnp.int32)
        ref_toks, _ = pipe_bf16(params, pixels, text_before, text_after)
        got_toks, _ = pipe_int8(qparams, pixels, text_before, text_after)
        a = float((np.asarray(ref_toks) == np.asarray(got_toks)).mean())
        agree.append(a)
        print(f"prompt {i}: agreement {a:.3f}")

    out = {
        "metric": "int8_serving_greedy_agreement",
        "prompts": args.prompts,
        "frames": args.frames,
        "decode_tokens": MAX_NEW_TOKENS,
        "mean_agreement": round(float(np.mean(agree)), 4),
        "min_agreement": round(float(np.min(agree)), 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
