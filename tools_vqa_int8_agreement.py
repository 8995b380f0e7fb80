"""Task-level int8-vs-bf16 agreement through the real eval CLI (VERDICT
round-4 item 5): build a FLAGSHIP-geometry synthetic checkpoint on disk
(repo init -> export_hf_safetensors, the same HF-format the reference
writes), answer a video-question file twice with eval/model_vqa.py —
once bf16, once --load-8bit (the qualified full-int8 serving config) —
and report answer-string agreement.

Complements tools_int8_qualify.py (raw-pipeline token agreement): this
goes through load_pretrained_model, the conversation template, tokenizer
decode and stopping — the lmms-eval-shaped path.

Run: python tools_vqa_int8_agreement.py [--questions 6] [--frames 64]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np


def build_checkpoint(d: str) -> None:
    import jax
    import jax.numpy as jnp

    from memory_augmented_vlm_tpu.config import VLMConfig
    from memory_augmented_vlm_tpu.checkpoint.orbax_io import (
        export_hf_safetensors,
    )
    from memory_augmented_vlm_tpu.models import vlm

    cfg = VLMConfig.onevision_0_5b()
    params = vlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    export_hf_safetensors(params, cfg, d)
    lm = cfg.lm
    config = dict(
        vocab_size=lm.vocab_size, hidden_size=lm.hidden_size,
        intermediate_size=lm.intermediate_size,
        num_hidden_layers=lm.num_hidden_layers,
        num_attention_heads=lm.num_attention_heads,
        num_key_value_heads=lm.num_key_value_heads,
        max_position_embeddings=32768, rope_theta=lm.rope_theta,
        tie_word_embeddings=lm.tie_word_embeddings,
        model_type="llava_qwen",
        mm_vision_tower="google/siglip-so400m-patch14-384",
        mm_projector_type="mlp2x_gelu",
        mm_patch_merge_type="spatial_unpad",
        mm_newline_position="one_token",
        mm_spatial_pool_mode="bilinear",
        tokenizer_model_max_length=32768,
    )
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(config, f)
    from tokenizers import Tokenizer, models as tok_models, pre_tokenizers
    from tokenizers import trainers

    tok = Tokenizer(tok_models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=2000,
        special_tokens=["<|endoftext|>", "<|im_start|>", "<|im_end|>"],
        show_progress=False)
    tok.train_from_iterator(
        ["describe the video", "what happens here", "a cat sits on a mat",
         "how many people are there"] * 50, trainer)
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "eos_token": "<|im_end|>", "pad_token": "<|endoftext|>"},
                  f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--questions", type=int, default=6)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--max-new-tokens", type=int, default=64)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="vqa_int8_")
    ckpt = os.path.join(work, "ckpt")
    vids = os.path.join(work, "videos")
    os.makedirs(vids, exist_ok=True)
    if not os.path.exists(os.path.join(ckpt, "model.safetensors")):
        print(f"building flagship checkpoint under {ckpt}...", flush=True)
        build_checkpoint(ckpt)

    from memory_augmented_vlm_tpu.data import video as video_mod

    rng = np.random.default_rng(0)
    questions = []
    qfile = os.path.join(work, "questions.jsonl")
    texts = ["describe the video", "what happens here",
             "how many people are there", "what is the main object",
             "what happens at the end", "describe the scene"]
    with open(qfile, "w") as f:
        for i in range(args.questions):
            name = f"clip{i}.y4m"
            frames = rng.integers(
                0, 255, size=(args.frames, 96, 96, 3), dtype=np.uint8)
            video_mod.write_y4m(os.path.join(vids, name), frames, fps=30)
            q = {"question_id": i, "video": name,
                 "text": texts[i % len(texts)]}
            questions.append(q)
            f.write(json.dumps(q) + "\n")

    answers = {}
    for tag, extra in (("bf16", []), ("int8", ["--load-8bit"])):
        out = os.path.join(work, f"answers_{tag}.jsonl")
        cmd = [sys.executable, "-m",
               "memory_augmented_vlm_tpu.eval.model_vqa",
               "--model-path", ckpt, "--question-file", qfile,
               "--video-folder", vids, "--answers-file", out,
               "--max_new_tokens", str(args.max_new_tokens),
               "--max_frames_num", str(args.frames)] + extra
        print("running:", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, cwd=os.path.dirname(
            os.path.abspath(__file__)))
        with open(out) as f:
            rows = [json.loads(l) for l in f if l.strip()]
        # compare the raw generated ids — the synthetic checkpoint's tiny
        # test tokenizer decodes out-of-vocab ids to the empty string, so a
        # text-only comparison would be vacuous
        answers[tag] = {r["question_id"]: tuple(r["output_ids"])
                        for r in rows}

    n = len(answers["bf16"])
    same, tok_agree = 0, []
    for qid in sorted(answers["bf16"]):
        a, b = answers["bf16"][qid], answers["int8"].get(qid, ())
        same += int(a == b)
        m = max(len(a), len(b), 1)
        tok_agree.append(
            sum(x == y for x, y in zip(a, b)) / m)
        mark = "==" if a == b else "!="
        print(f"q{qid}: {mark} len {len(a)}/{len(b)} "
              f"ids bf16={list(a[:8])} int8={list(b[:8])}")
    print(json.dumps({
        "metric": "int8_vqa_answer_agreement",
        "questions": n,
        "exact_match": f"{same}/{n}",
        "mean_token_agreement": round(sum(tok_agree) / max(n, 1), 4),
        "frames": args.frames,
        "max_new_tokens": args.max_new_tokens,
    }))


if __name__ == "__main__":
    main()
