"""lmms-eval model adapter.

The reference is evaluated via the external lmms-eval harness with its
`llava_onevision` model class (README.md:41-49), which consumes
`load_pretrained_model` + `generate`. This adapter exposes the same surface
for our backend so `--model mavlm_tpu --model_args pretrained=...,
max_frames_num=...` runs the unchanged task suite
(longvideobench_val_v, videomme, mlvu_dev, nextqa_mc_test, egoschema).

lmms-eval is not bundled in this image; when it is importable the class
registers itself, otherwise it still works standalone for our eval CLIs.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.data.conversation import conv_templates
from memory_augmented_vlm_tpu.data.tokenizer import tokenizer_image_token
from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model

try:  # optional dependency
    from lmms_eval.api.model import lmms as _LmmsBase  # type: ignore
    from lmms_eval.api.registry import register_model  # type: ignore

    _HAVE_LMMS = True
except ImportError:  # standalone fallback
    _LmmsBase = object

    def register_model(*names):
        def deco(cls):
            return cls

        return deco

    _HAVE_LMMS = False


@register_model("mavlm_tpu")
class MavlmTpu(_LmmsBase):
    """Generate-until adapter over the TPU-native backend."""

    def __init__(
        self,
        pretrained: str,
        max_frames_num: int = 64,
        conv_template: str = "qwen_1_5",
        device: str = "tpu",
        batch_size: int = 1,
        attn_implementation: str = "pallas_flash",
        overwrite_config: Optional[dict] = None,
        **kwargs,
    ):
        if _HAVE_LMMS:
            super().__init__()
        self.max_frames_num = int(max_frames_num)
        self.conv_template = conv_template
        (self.tokenizer, self.model, self.image_processor,
         self.context_len) = load_pretrained_model(
            pretrained, None, "llava_qwen",
            attn_implementation=attn_implementation,
            overwrite_config=overwrite_config,
        )

    # -- core answer function (shared by lmms-eval and standalone use) -----
    def answer(self, question: str, visuals=None, modality: str = "video",
               max_new_tokens: int = 128, temperature: float = 0.0,
               until=None) -> str:
        pixels = None
        if visuals is not None:
            frames = np.asarray(visuals)
            if modality == "video" and frames.shape[0] > self.max_frames_num:
                idx = np.linspace(0, frames.shape[0] - 1,
                                  self.max_frames_num).astype(int)
                frames = frames[idx]
            pixels = self.image_processor.preprocess(frames)
            if constants.DEFAULT_IMAGE_TOKEN not in question:
                question = constants.DEFAULT_IMAGE_TOKEN + "\n" + question
        conv = conv_templates[self.conv_template].copy()
        conv.append_message(conv.roles[0], question)
        conv.append_message(conv.roles[1], None)
        ids = tokenizer_image_token(conv.get_prompt(), self.tokenizer)
        out = self.model.generate(
            ids[None],
            images=[pixels] if pixels is not None else None,
            modalities=[modality],
            do_sample=temperature > 0,
            temperature=temperature,
            max_new_tokens=max_new_tokens,
            eos_token_id=self.tokenizer.convert_tokens_to_ids("<|im_end|>"),
        )
        text = self.tokenizer.decode(out[0], skip_special_tokens=True).strip()
        # keyword stopping (KeywordsStoppingCriteria semantics): truncate at
        # the first occurrence of any stop string
        for stop in (until or []):
            if stop and stop in text:
                text = text.split(stop)[0]
        return text.strip()

    # -- lmms-eval API ------------------------------------------------------
    def generate_until(self, requests) -> List[str]:
        results = []
        for req in requests:
            contexts, gen_kwargs, doc_to_visual, doc_id, task, split = req.args
            visuals = doc_to_visual(self.task_dict[task][split][doc_id]) \
                if hasattr(self, "task_dict") else None
            vis = None
            modality = "video"
            if visuals:
                first = visuals[0]
                if hasattr(first, "convert"):  # PIL image(s)
                    vis = np.stack([np.asarray(v.convert("RGB")) for v in visuals])
                    modality = "image" if len(visuals) == 1 else "video"
                else:
                    vis = np.asarray(first)
            results.append(self.answer(
                contexts,
                visuals=vis,
                modality=modality,
                max_new_tokens=gen_kwargs.get("max_new_tokens", 128),
                temperature=gen_kwargs.get("temperature", 0.0),
                until=gen_kwargs.get("until"),
            ))
        return results

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        raise NotImplementedError("mavlm_tpu supports generate_until tasks")

    def generate_until_multi_round(self, requests):
        raise NotImplementedError
