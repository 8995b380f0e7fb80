"""OneVision trial tutorial (reference docs/onevision_trial.py:1-116):
single-image QA twice — once with the blocking ``generate`` API, once
streaming chunks as they decode (the reference's second half spins a
``TextIteratorStreamer`` thread; here ``vlm.generate_stream`` yields from
inside the jitted chunked decode, no thread needed).

  python docs/onevision_trial.py --model-path <ckpt> --image photo.jpg
"""

import os
import sys

# runnable as `python docs/<name>.py` from anywhere: the package
# imports from the repo root, not the script dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

from PIL import Image

from memory_augmented_vlm_tpu.data.conversation import conv_templates
from memory_augmented_vlm_tpu.data.tokenizer import tokenizer_image_token
from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model
from memory_augmented_vlm_tpu.models.image_path import image_qa_embeds
from memory_augmented_vlm_tpu.models import vlm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--question", default="What is shown in this image?")
    p.add_argument("--max-new-tokens", type=int, default=256)
    args = p.parse_args()

    tokenizer, model, image_processor, context_len = load_pretrained_model(
        args.model_path, None, "llava_qwen")
    eos = (tokenizer.convert_tokens_to_ids("<|im_end|>"),)

    conv = conv_templates["qwen_1_5"].copy()
    conv.append_message(conv.roles[0], "<image>\n" + args.question)
    conv.append_message(conv.roles[1], None)
    ids = tokenizer_image_token(conv.get_prompt(), tokenizer)

    embeds = image_qa_embeds(model.params, model.cfg,
                             Image.open(args.image), ids,
                             image_processor=image_processor)

    # cap new tokens by the remaining context, like the reference (:79-81)
    max_new = min(args.max_new_tokens, context_len - embeds.shape[0])

    # 1) blocking generate
    out = vlm.generate(model.params, model.cfg, embeds,
                       max_new_tokens=max_new, eos_token_ids=eos)
    n = int(out.num_tokens)
    print(tokenizer.decode(out.tokens[:n], skip_special_tokens=True))

    # 2) streaming: chunks arrive while the decode loop is still running
    print("--- streaming ---")
    for chunk in vlm.generate_stream(model.params, model.cfg, embeds,
                                     max_new_tokens=max_new,
                                     eos_token_ids=eos):
        print(tokenizer.decode(chunk, skip_special_tokens=True),
              end="", flush=True)
    print()


if __name__ == "__main__":
    main()
