"""Serving tutorial — the continuous-batching engine end to end.

Shows the round-3 serving machinery on one engine: a shared system-prompt
prefix (computed once), chunked prefill (long prompts admit without
stalling active decodes), the int8 KV cache (half the slot-pool HBM), and
exact-greedy prompt-lookup speculation on the single-request path.

  python docs/serving_tutorial.py --model-path <ckpt> [--kv-int8]
      [--chunk-prefill 512] [--num-slots 4]

For the full worker protocol (controller registration, \\0-JSON streaming)
see serve/sglang_worker.py; this tutorial drives the engine directly.
"""

import os
import sys

# runnable as `python docs/<name>.py` from anywhere: the package
# imports from the repo root, not the script dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import threading

import numpy as np
import jax.numpy as jnp

from memory_augmented_vlm_tpu.data.conversation import conv_templates
from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model
from memory_augmented_vlm_tpu.models import qwen2, vlm
from memory_augmented_vlm_tpu.serve.batch_engine import BatchEngine


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--num-slots", type=int, default=4)
    p.add_argument("--max-len", type=int, default=4096)
    p.add_argument("--kv-int8", action="store_true")
    p.add_argument("--chunk-prefill", type=int, default=0)
    p.add_argument("--decode-ticks", type=int, default=1,
                   help="K decode steps per dispatch (multi-step "
                   "scheduling; pays one host round-trip per K tokens)")
    p.add_argument("--max-new-tokens", type=int, default=128)
    args = p.parse_args()

    tokenizer, model, _, _ = load_pretrained_model(
        args.model_path, None, "llava_qwen")
    lm = model.params["language_model"]

    def embed(text: str) -> np.ndarray:
        ids = tokenizer.encode(text, add_special_tokens=False)
        return np.asarray(qwen2.embed_tokens(
            lm, jnp.asarray(ids, jnp.int32), model.cfg.lm))

    engine = BatchEngine(model.params, model.cfg,
                         num_slots=args.num_slots, max_len=args.max_len,
                         kv_int8=args.kv_int8,
                         chunk_prefill=args.chunk_prefill,
                         decode_ticks=args.decode_ticks).start()
    try:
        # the system prompt computes its KV once; every request below
        # prefills only its suffix
        conv = conv_templates["qwen_1_5"].copy()
        engine.set_prefix(embed(conv.system + "\n"))

        questions = [
            "What is the capital of France?",
            "Write a haiku about autumn.",
            "Explain KV caching in one sentence.",
        ]
        results = [None] * len(questions)

        def ask(i):
            conv_i = conv_templates["qwen_1_5"].copy()
            conv_i.append_message(conv_i.roles[0], questions[i])
            conv_i.append_message(conv_i.roles[1], None)
            suffix = conv_i.get_prompt()[len(conv_i.system) + 1:]
            toks = engine.generate(embed(suffix), use_prefix=True,
                                   max_new_tokens=args.max_new_tokens)
            results[i] = tokenizer.decode(toks, skip_special_tokens=True)

        threads = [threading.Thread(target=ask, args=(i,))
                   for i in range(len(questions))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for q, a in zip(questions, results):
            print(f"Q: {q}\nA: {a}\n")
    finally:
        engine.shutdown()

    # single-request latency path: exact-greedy prompt-lookup speculation
    prompt = "Summarize: the quick brown fox jumps over the lazy dog."
    ids = np.asarray(tokenizer.encode(prompt, add_special_tokens=False))
    out, info = vlm.generate_speculative(
        model.params, model.cfg,
        jnp.asarray(embed(prompt)), draft_ids=ids,
        max_new_tokens=args.max_new_tokens)
    n = int(out.num_tokens)
    print("speculative:",
          tokenizer.decode(np.asarray(out.tokens)[:n],
                           skip_special_tokens=True))
    print(f"({n} tokens in {info['iterations']} LM forwards)")


if __name__ == "__main__":
    main()
