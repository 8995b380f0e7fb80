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


def _timed_fetch(fn, i):
    t0 = time.perf_counter()
    # vary the input so the relay's identical-execution cache cannot serve it
    _ = np.asarray(fn(jnp.full((8,), float(i), jnp.float32)))
    return time.perf_counter() - t0


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

    # Measure THIS session's dispatch floor: a trivial jitted graph plus a
    # value fetch is one full relay round trip, the same per-tick overhead
    # the engine pays. A real deployment's dispatch is ~1 ms; the projected
    # column below replaces the measured floor with that (VERDICT round-4
    # item 7).
    tiny = jax.jit(lambda x: x + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8,), jnp.float32)))
    floor_s = min(
        _timed_fetch(tiny, i) for i in range(8))

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
        rounds0 = engine.stats["decode_rounds"]
        t0 = time.perf_counter()
        total = 0
        for o in outs:
            while True:
                item = o.get(timeout=600)
                if item is None:
                    break
                total += len(item)
        dt = time.perf_counter() - t0
        rounds = engine.stats["decode_rounds"] - rounds0
        # per-round device time with the relay dispatch floor subtracted;
        # projected tok/s re-adds a 1 ms real-host dispatch per round
        device_per_round = max(dt / max(rounds, 1) - floor_s, 1e-4)
        projected = total / (rounds * (device_per_round + 1e-3))
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
                "decode_rounds_timed": rounds,
                "dispatch_floor_ms": round(floor_s * 1e3, 2),
                "device_ms_per_round": round(device_per_round * 1e3, 2),
                "projected_tokens_per_s_1ms_dispatch": round(projected, 1),
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
