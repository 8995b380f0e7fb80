"""Video QA tutorial — the docs/video_tutorial.py equivalent of the reference.

Runs the flagship path end to end: load a checkpoint, decode+sample frames,
build the memory-augmented multimodal sequence, generate an answer.

  python docs/video_tutorial.py --model-path <ckpt> --video <clip|.npy|framedir>
"""

import os
import sys

# runnable as `python docs/<name>.py` from anywhere: the package
# imports from the repo root, not the script dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

from memory_augmented_vlm_tpu.data.conversation import conv_templates
from memory_augmented_vlm_tpu.data.tokenizer import tokenizer_image_token
from memory_augmented_vlm_tpu.data.video import load_video
from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--video", required=True)
    p.add_argument("--question", default="Describe what happens in this video.")
    p.add_argument("--max-frames-num", type=int, default=64)
    p.add_argument("--max-new-tokens", type=int, default=256)
    args = p.parse_args()

    tokenizer, model, image_processor, _ = load_pretrained_model(
        args.model_path, None, "llava_qwen",
        overwrite_config={"max_frames_num": args.max_frames_num})

    frames, video_time, frame_times, num = load_video(args.video)
    print(f"video {video_time:.1f}s -> {num} sampled frames")
    pixels = image_processor.preprocess(frames)

    conv = conv_templates["qwen_1_5"].copy()
    conv.append_message(conv.roles[0], "<image>\n" + args.question)
    conv.append_message(conv.roles[1], None)
    ids = tokenizer_image_token(conv.get_prompt(), tokenizer)

    out = model.generate(
        ids[None], images=[pixels], modalities=["video"],
        max_new_tokens=args.max_new_tokens,
        eos_token_id=tokenizer.convert_tokens_to_ids("<|im_end|>"))
    print(tokenizer.decode(out[0], skip_special_tokens=True))


if __name__ == "__main__":
    main()
