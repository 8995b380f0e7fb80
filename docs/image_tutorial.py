"""Single-image QA tutorial — the docs/image_tutorial.py equivalent
(BASELINE config #1): anyres preprocessing + OneVision splice.

  python docs/image_tutorial.py --model-path <ckpt> --image photo.jpg
"""

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

    tokenizer, model, image_processor, _ = load_pretrained_model(
        args.model_path, None, "llava_qwen")

    conv = conv_templates["qwen_1_5"].copy()
    conv.append_message(conv.roles[0], "<image>\n" + args.question)
    conv.append_message(conv.roles[1], None)
    ids = tokenizer_image_token(conv.get_prompt(), tokenizer)

    embeds = image_qa_embeds(model.params, model.cfg,
                             Image.open(args.image), ids,
                             image_processor=image_processor)
    out = vlm.generate(
        model.params, model.cfg, embeds,
        max_new_tokens=args.max_new_tokens,
        eos_token_ids=(tokenizer.convert_tokens_to_ids("<|im_end|>"),))
    n = int(out.num_tokens)
    print(tokenizer.decode(out.tokens[:n], skip_special_tokens=True))


if __name__ == "__main__":
    main()
