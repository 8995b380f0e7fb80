"""Serving benchmark: continuous-batching decode throughput on the 0.5B
flagship LM geometry (the sglang-class worker's steady state).

Fills all engine slots with long prompts, then measures sustained decode
tokens/s across the pool. Flags A/B the round-3 serving machinery:

    python bench_serving.py [--num_slots 4] [--max_len 2048]
        [--prompt_len 1500] [--kv_int8] [--chunk_prefill 512]

Prints one JSON line (not the driver metric). Run on the real TPU;
compare within-session only (relay variance, PERFORMANCE.md).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.serve.batch_engine import BatchEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_slots", type=int, default=4)
    ap.add_argument("--max_len", type=int, default=2048)
    ap.add_argument("--prompt_len", type=int, default=1500)
    ap.add_argument("--decode_tokens", type=int, default=64,
                    help="tokens per request in the timed phase")
    ap.add_argument("--kv_int8", action="store_true")
    ap.add_argument("--chunk_prefill", type=int, default=0)
    ap.add_argument("--speculative", type=int, default=0)
    ap.add_argument("--decode_ticks", type=int, default=1)
    ap.add_argument("--paged_page_size", type=int, default=0)
    ap.add_argument("--paged_pages", type=int, default=None)
    args = ap.parse_args()

    cfg = VLMConfig.onevision_0_5b()
    params = {"language_model": qwen2.init_params(
        cfg.lm, jax.random.key(0), dtype=jnp.bfloat16)}
    rng = np.random.default_rng(0)

    engine = BatchEngine(params, cfg, num_slots=args.num_slots,
                         max_len=args.max_len, kv_int8=args.kv_int8,
                         chunk_prefill=args.chunk_prefill,
                         speculative=args.speculative,
                         decode_ticks=args.decode_ticks,
                         paged_page_size=args.paged_page_size,
                         paged_pages=args.paged_pages).start()
    try:
        def submit():
            ids = rng.integers(0, 1000, size=(args.prompt_len,))
            emb = np.asarray(qwen2.embed_tokens(
                params["language_model"], jnp.asarray(ids, jnp.int32),
                cfg.lm), np.float32)
            return engine.submit(emb, max_new_tokens=args.decode_tokens,
                                 eos_token_ids=(151645,),
                                 draft_ids=tuple(int(t) for t in ids))

        # warmup: compile prefill + decode graphs, fill every slot
        outs = [submit() for _ in range(args.num_slots)]
        t0 = time.perf_counter()
        first = [o.get(timeout=600) for o in outs]  # first token per slot
        t_first = time.perf_counter() - t0
        n = sum(1 for f in first if f is not None)
        # timed steady state: drain the remaining tokens of all slots
        t0 = time.perf_counter()
        total = 0
        for o in outs:
            while True:
                item = o.get(timeout=600)
                if item is None:
                    break
                total += len(item)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "serving_decode_tokens_per_s_0.5b",
            "value": round(total / dt, 1),
            "unit": "tokens/s",
            "detail": {
                "num_slots": args.num_slots,
                "prompt_len": args.prompt_len,
                "max_len": args.max_len,
                "kv_int8": args.kv_int8,
                "chunk_prefill": args.chunk_prefill,
                "speculative": args.speculative,
                "decode_ticks": args.decode_ticks,
                "paged_page_size": args.paged_page_size,
                "paged_pages": args.paged_pages,
                "engine_stats": dict(engine.stats),
                "decode_tokens_timed": total,
                "steady_s": round(dt, 3),
                "time_to_first_tokens_s": round(t_first, 3),
                "first_tokens": n,
                "backend": jax.default_backend(),
            },
        }))
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
