"""Drive the eval-suite surface end-to-end on the default (TPU) backend:
tiny HF-format checkpoint -> model_vqa (video QA + consistency pair) ->
gpt_eval scorers -> evaluate_interleave --result-dir."""
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

root = tempfile.mkdtemp(prefix="evalsuite_")


def build_ckpt(d):
    import torch
    from safetensors.torch import save_file
    from transformers import (Qwen2Config, Qwen2ForCausalLM,
                              SiglipVisionConfig, SiglipVisionModel)

    torch.manual_seed(0)
    os.makedirs(d, exist_ok=True)
    lm_cfg = dict(vocab_size=50000, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, max_position_embeddings=2048,
                  rope_theta=10000.0)
    hf_lm = Qwen2ForCausalLM(Qwen2Config(tie_word_embeddings=False,
                                         **lm_cfg)).float()
    vis = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14)).float()
    sd = dict(hf_lm.state_dict())
    for k, v in vis.state_dict().items():
        sd["model.vision_tower.vision_tower." + k] = v
    h = 32
    sd["model.mm_projector.0.weight"] = torch.randn(h, 24) * 0.02
    sd["model.mm_projector.0.bias"] = torch.zeros(h)
    sd["model.mm_projector.2.weight"] = torch.randn(h, h) * 0.02
    sd["model.mm_projector.2.bias"] = torch.zeros(h)

    def attn(prefix):
        out = {}
        for name in ("q_proj", "k_proj", "v_proj"):
            out[f"{prefix}.{name}.weight"] = torch.randn(h, h) * 0.02
            out[f"{prefix}.{name}.bias"] = torch.zeros(h)
        out[f"{prefix}.residual.dense.weight"] = torch.randn(h, h) * 0.02
        out[f"{prefix}.residual.dense.bias"] = torch.zeros(h)
        out[f"{prefix}.residual.layernorm.weight"] = torch.ones(h)
        out[f"{prefix}.residual.layernorm.bias"] = torch.zeros(h)
        return out

    rmt = "model.recurrent_memory_transformer"
    sd[f"{rmt}.initial_memory"] = torch.randn(2, 4, h) * 0.02
    sd[f"{rmt}.memory_pos_embed"] = torch.randn(2, 1, h)
    sd.update(attn(f"{rmt}.memory_update_attention"))
    for i in range(2):
        sd.update(attn(f"{rmt}.layers.{i}.memory_segment_fusion_attention"))
        sd[f"{rmt}.layers.{i}.mlp.0.weight"] = torch.randn(4 * h, h) * 0.02
        sd[f"{rmt}.layers.{i}.mlp.0.bias"] = torch.zeros(4 * h)
        sd[f"{rmt}.layers.{i}.residual.dense.weight"] = \
            torch.randn(h, 4 * h) * 0.02
        sd[f"{rmt}.layers.{i}.residual.dense.bias"] = torch.zeros(h)
        sd[f"{rmt}.layers.{i}.residual.layernorm.weight"] = torch.ones(h)
        sd[f"{rmt}.layers.{i}.residual.layernorm.bias"] = torch.zeros(h)
    sd["model.memory_fuser.0.weight"] = torch.randn(4 * h, h) * 0.02
    sd["model.memory_fuser.0.bias"] = torch.zeros(4 * h)
    sd["model.memory_fuser.2.weight"] = torch.randn(h, 4 * h) * 0.02
    sd["model.memory_fuser.2.bias"] = torch.zeros(h)
    sd["model.token_type_embedding.weight"] = torch.randn(2, h) * 0.02
    sd["model.image_newline"] = torch.randn(h) * 0.02
    save_file({k: v.contiguous() for k, v in sd.items()},
              os.path.join(d, "model.safetensors"))

    from tokenizers import (Tokenizer, models as tok_models, pre_tokenizers,
                            trainers)

    tok = Tokenizer(tok_models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=2000,
        special_tokens=["<|endoftext|>", "<|im_start|>", "<|im_end|>"],
        show_progress=False)
    tok.train_from_iterator(
        ["describe the video", "hello world", "a cat sits",
         "what is here"] * 50, trainer)
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "eos_token": "<|im_end|>",
                   "pad_token": "<|endoftext|>"}, f)
    config = dict(lm_cfg, model_type="llava_qwen",
                  mm_projector_type="mlp2x_gelu",
                  mm_patch_merge_type="spatial_unpad",
                  mm_newline_position="one_token",
                  mm_spatial_pool_mode="bilinear",
                  tokenizer_model_max_length=2048,
                  tie_word_embeddings=False)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(config, f)


ckpt = os.path.join(root, "ckpt")
build_ckpt(ckpt)

rng = np.random.default_rng(0)
vid = (rng.random((8, 56, 56, 3)) * 255).astype(np.uint8)
np.save(os.path.join(root, "clip.npy"), vid)
with open(os.path.join(root, "q.jsonl"), "w") as f:
    f.write(json.dumps({"question_id": 1, "video": "clip.npy",
                        "question": "what is in the video",
                        "answer": "a cat sits"}) + "\n")
    f.write(json.dumps({"question_id": 2, "video": "clip.npy",
                        "Q1": "describe the video",
                        "Q2": "what is here",
                        "A": "hello world"}) + "\n")

out = os.path.join(root, "answers.jsonl")
subprocess.run([sys.executable, "-m",
                "memory_augmented_vlm_tpu.eval.model_vqa",
                "--model-path", ckpt,
                "--question-file", os.path.join(root, "q.jsonl"),
                "--video-folder", root,
                "--answers-file", out,
                "--max_frames_num", "8",
                "--extra-prompt", " Answer briefly.",
                "--max_new_tokens", "8"],
               check=True, cwd="/root/repo")

rows = [json.loads(l) for l in open(out)]
print("answers rows:", json.dumps(rows))
assert len(rows) == 2
assert "error" not in rows[0], rows[0]
assert rows[1].get("pred2") is not None, "consistency pair missing pred2"
assert rows[1].get("answer") == "hello world"

# score: QA protocol + consistency axis + an axis score, offline judge
r1 = subprocess.run([sys.executable, "-m",
                     "memory_augmented_vlm_tpu.eval.gpt_eval",
                     "--pred_path", out, "--mode", "qa"],
                    check=True, cwd="/root/repo", capture_output=True,
                    text=True)
print("qa:", r1.stdout.strip())
res = json.loads(r1.stdout.strip().splitlines()[-1])
assert res["n"] == 2 and "accuracy" in res

r2 = subprocess.run([sys.executable, "-m",
                     "memory_augmented_vlm_tpu.eval.gpt_eval",
                     "--pred_path", out, "--mode", "consistency"],
                    check=True, cwd="/root/repo", capture_output=True,
                    text=True)
print("consistency:", r2.stdout.strip())

# interleave scorer over a chunk dir
idir = os.path.join(root, "interleave")
os.makedirs(idir)
with open(os.path.join(idir, "result_0.jsonl"), "w") as f:
    f.write(json.dumps({"dataset": "Spot-the-Diff", "question_id": 0,
                        "text": rows[0]["text"] or "x",
                        "answer": "a cat sits"}) + "\n")
r3 = subprocess.run([sys.executable, "-m",
                     "memory_augmented_vlm_tpu.eval.evaluate_interleave",
                     "--result-dir", idir],
                    check=True, cwd="/root/repo", capture_output=True,
                    text=True)
print("interleave:", r3.stdout.strip())
print("EVALSUITE VERIFY OK", root)
