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

def _import_lmms():
    try:
        from lmms_eval.api.model import lmms as base  # type: ignore
        from lmms_eval.api.registry import register_model as reg  # type: ignore

        return base, reg
    except ImportError:
        return None


_found = _import_lmms()
if _found is None:
    # fall back to the vendored API subset (third_party/lmms_eval)
    import pathlib
    import sys

    _vendored = pathlib.Path(__file__).resolve().parents[2] / "third_party"
    if (_vendored / "lmms_eval").is_dir() and str(_vendored) not in sys.path:
        sys.path.append(str(_vendored))
        _found = _import_lmms()

if _found is not None:
    _LmmsBase, register_model = _found
    _HAVE_LMMS = True
else:  # standalone fallback
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


    # -- shared request plumbing -------------------------------------------
    def _prep_pixels(self, visuals, modality: str):
        """Subsample videos to max_frames_num and run the image processor."""
        if visuals is None:
            return None
        frames = np.asarray(visuals)
        if modality == "video" and frames.shape[0] > self.max_frames_num:
            idx = np.linspace(0, frames.shape[0] - 1,
                              self.max_frames_num).astype(int)
            frames = frames[idx]
        return self.image_processor.preprocess(frames)

    @staticmethod
    def _normalize_until(until) -> list:
        """gen_kwargs['until'] may be None, a bare string, or a list."""
        if until is None:
            return []
        if isinstance(until, str):
            return [until]
        return list(until)

    def _encode_stops(self, until: list) -> tuple:
        """Stop strings -> token-id sequences for in-loop keyword stopping
        (KeywordsStoppingCriteria, llava/mm_utils.py:372); text-level
        truncation stays as the backstop for mid-stream retokenization."""
        seqs = []
        for stop in until:
            tok = self.tokenizer.encode(stop, add_special_tokens=False)
            if tok:
                seqs.append(tuple(tok))
        return tuple(seqs)

    @staticmethod
    def _truncate_at_stops(text: str, until: list) -> str:
        for stop in until:
            if stop and stop in text:
                text = text.split(stop)[0]
        return text.strip()

    def _doc_visuals(self, doc_to_visual, task: str, split: str, doc_id):
        """doc_to_visual output (PIL images or arrays) -> (array, modality)."""
        doc = (self.task_dict[task][split][doc_id]
               if getattr(self, "task_dict", {}).get(task) else None)
        visuals = (doc_to_visual(doc)
                   if (doc is not None and callable(doc_to_visual)) else None)
        if not visuals:
            return None, "video", doc
        first = visuals[0]
        if hasattr(first, "convert"):  # PIL image(s)
            vis = np.stack([np.asarray(v.convert("RGB")) for v in visuals])
            return vis, ("image" if len(visuals) == 1 else "video"), doc
        return np.asarray(first), "video", doc

    # -- core answer function (shared by lmms-eval and standalone use) -----
    def answer(self, question: str, visuals=None, modality: str = "video",
               max_new_tokens: int = 128, temperature: float = 0.0,
               until=None) -> str:
        until = self._normalize_until(until)
        pixels = self._prep_pixels(visuals, modality)
        if pixels is not None and constants.DEFAULT_IMAGE_TOKEN not in question:
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
            stop_sequences=self._encode_stops(until),
        )
        text = self.tokenizer.decode(out[0], skip_special_tokens=True).strip()
        return self._truncate_at_stops(text, until)

    # -- lmms-eval API ------------------------------------------------------
    def generate_until(self, requests) -> List[str]:
        results = []
        for req in requests:
            contexts, gen_kwargs, doc_to_visual, doc_id, task, split = req.args
            vis, modality, _ = self._doc_visuals(doc_to_visual, task, split, doc_id)
            results.append(self.answer(
                contexts,
                visuals=vis,
                modality=modality,
                max_new_tokens=gen_kwargs.get("max_new_tokens", 128),
                temperature=gen_kwargs.get("temperature", 0.0),
                until=gen_kwargs.get("until"),
            ))
        return results

    def score(self, context: str, continuation: str, visuals=None,
              modality: str = "video") -> Tuple[float, bool]:
        """(sum log p(continuation | context, visuals), is_greedy) — the
        lmms-eval `loglikelihood` contract for one request."""
        from memory_augmented_vlm_tpu.models import vlm as vlm_mod

        pixels = self._prep_pixels(visuals, modality)
        if pixels is not None and constants.DEFAULT_IMAGE_TOKEN not in context:
            context = constants.DEFAULT_IMAGE_TOKEN + "\n" + context
        conv = conv_templates[self.conv_template].copy()
        conv.append_message(conv.roles[0], context)
        conv.append_message(conv.roles[1], None)
        prompt = conv.get_prompt()
        ids_ctx = tokenizer_image_token(prompt, self.tokenizer)
        ids_full = tokenizer_image_token(prompt + continuation, self.tokenizer)
        cont_ids = np.asarray(ids_full[len(ids_ctx):], np.int64)
        if cont_ids.size == 0:
            return 0.0, True
        embeds = self.model._row_embeds(
            np.asarray(ids_full, np.int64),
            pixels if pixels is not None else None,
            modality, None)
        return vlm_mod.score_continuation(
            self.model.params, self.model.cfg, embeds, cont_ids)

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        """lmms-eval protocol: requests carry
        (contexts, doc_to_target, doc_to_visual, doc_id, task, split)."""
        results = []
        for req in requests:
            contexts, doc_to_target, doc_to_visual, doc_id, task, split = req.args
            vis, modality, doc = self._doc_visuals(doc_to_visual, task, split,
                                                   doc_id)
            continuation = (doc_to_target(doc) if callable(doc_to_target)
                            else str(doc_to_target))
            results.append(self.score(contexts, continuation, visuals=vis,
                                      modality=modality))
        return results

    def answer_multi_round(self, turns, visuals=None, modality: str = "video",
                           max_new_tokens: int = 128,
                           temperature: float = 0.0, until=None) -> List[str]:
        """Multi-round chat over one visual context: each user turn is
        answered with the full history in the conversation template (the
        multi-round protocol newer lmms-eval tasks use)."""
        until = self._normalize_until(until)
        pixels = self._prep_pixels(visuals, modality)
        conv = conv_templates[self.conv_template].copy()
        answers = []
        stop_seqs = self._encode_stops(until)
        for round_idx, question in enumerate(turns):
            if (round_idx == 0 and pixels is not None
                    and constants.DEFAULT_IMAGE_TOKEN not in question):
                question = constants.DEFAULT_IMAGE_TOKEN + "\n" + question
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
                stop_sequences=stop_seqs,
            )
            text = self.tokenizer.decode(out[0], skip_special_tokens=True).strip()
            text = self._truncate_at_stops(text, until)
            conv.messages[-1][1] = text  # answered turn joins the history
            answers.append(text)
        return answers

    def generate_until_multi_round(self, requests) -> List[List[str]]:
        """Per request: a list of per-round responses."""
        results = []
        for req in requests:
            contexts, gen_kwargs, doc_to_visual, doc_id, task, split = req.args
            turns = list(contexts) if isinstance(contexts, (list, tuple)) \
                else [contexts]
            vis, modality, _ = self._doc_visuals(doc_to_visual, task, split,
                                                 doc_id)
            results.append(self.answer_multi_round(
                turns, visuals=vis, modality=modality,
                max_new_tokens=gen_kwargs.get("max_new_tokens", 128),
                temperature=gen_kwargs.get("temperature", 0.0),
                until=gen_kwargs.get("until"),
            ))
        return results
