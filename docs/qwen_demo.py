"""Text-only LM chat demo (reference scripts/qwen.py:1-19): apply the
ChatML template to one user prompt and greedy-decode through this repo's
Qwen2 stack (the reference snippet drives HF AutoModel on CUDA; here the
same checkpoint runs through `eval.builder.load_pretrained_model` +
`vlm.generate` on the default backend).

  python docs/qwen_demo.py --model-path <ckpt> \
      [--prompt "Give me a short introduction to large language model."]
"""

import os
import sys

# runnable as `python docs/<name>.py` from anywhere: the package
# imports from the repo root, not the script dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax.numpy as jnp

from memory_augmented_vlm_tpu.data.conversation import conv_templates
from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model
from memory_augmented_vlm_tpu.models import qwen2, vlm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--prompt",
                   default="Give me a short introduction to large language "
                           "model.")
    p.add_argument("--system", default="You are a helpful assistant.")
    p.add_argument("--max-new-tokens", type=int, default=512)
    args = p.parse_args()

    tokenizer, model, _, _ = load_pretrained_model(
        args.model_path, None, "llava_qwen")

    conv = conv_templates["qwen_1_5"].copy()
    conv.system = f"<|im_start|>system\n{args.system}"
    conv.append_message(conv.roles[0], args.prompt)
    conv.append_message(conv.roles[1], None)
    ids = tokenizer(conv.get_prompt()).input_ids

    embeds = qwen2.embed_tokens(
        model.params["language_model"], jnp.asarray(ids, jnp.int32),
        model.cfg.lm)
    out = vlm.generate(
        model.params, model.cfg, embeds,
        max_new_tokens=args.max_new_tokens,
        eos_token_ids=(tokenizer.convert_tokens_to_ids("<|im_end|>"),))
    n = int(out.num_tokens)
    print(tokenizer.decode(out.tokens[:n], skip_special_tokens=True))


if __name__ == "__main__":
    main()
