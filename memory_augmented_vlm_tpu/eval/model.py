"""Object-oriented shell over the functional core — the public inference API
surface that the reference exposes as `LlavaQwenForCausalLM`
(llava/model/language_model/llava_qwen.py:116-136) and that the lmms-eval
`llava_onevision` adapter consumes.

The shell holds (params, VLMConfig, tokenizer) and routes `.generate()`
through the jitted functional pipeline (models/vlm.py). Accepts numpy or
torch tensors for ids/images (lmms-eval passes torch CPU tensors).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.config import VLMConfig
from memory_augmented_vlm_tpu.models import vlm


def _to_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


class MavlmConfig:
    """Duck-typed stand-in for the HF config object callers poke at."""

    def __init__(self, cfg: VLMConfig, raw: Optional[dict] = None):
        self._cfg = cfg
        self.hidden_size = cfg.lm.hidden_size
        self.vocab_size = cfg.lm.vocab_size
        self.max_position_embeddings = cfg.lm.max_position_embeddings
        self.mm_newline_position = cfg.pipeline.mm_newline_position
        self.mm_spatial_pool_mode = cfg.pipeline.mm_spatial_pool_mode
        self.mm_patch_merge_type = cfg.pipeline.mm_patch_merge_type
        self.image_aspect_ratio = cfg.pipeline.image_aspect_ratio
        self.tokenizer_model_max_length = cfg.pipeline.tokenizer_model_max_length
        self.tokenizer_padding_side = cfg.pipeline.tokenizer_padding_side
        for k, v in (raw or {}).items():
            if not hasattr(self, k):
                try:
                    setattr(self, k, v)
                except Exception:
                    pass


class MavlmForCausalLM:
    """Flagship VLM with the reference's `.generate` signature."""

    def __init__(self, params, cfg: VLMConfig, raw_config: Optional[dict] = None,
                 dtype=jnp.bfloat16, device_preprocess: bool = False):
        self.params = params
        self.cfg = cfg
        self.config = MavlmConfig(cfg, raw_config)
        self.dtype = dtype
        self.device = "tpu"
        # device_preprocess: raw uint8 VIDEO frames skip the host PIL loop
        # and are resized/normalized inside the tower jit
        # (ops/preprocess.py) — same kernel math as PIL bicubic, minus its
        # uint8 requantize; opt-in because the host path is the bit-exact
        # reference parity surface.
        self.device_preprocess = device_preprocess

    def eval(self):
        return self

    def to(self, *args, **kwargs):
        return self

    def half(self):
        return self

    def tie_weights(self):
        return self

    def generate(
        self,
        input_ids,
        images: Optional[Union[Sequence, np.ndarray]] = None,
        modalities: Union[str, Sequence[str]] = "image",
        image_sizes=None,
        attention_mask=None,
        do_sample: bool = False,
        temperature: float = 0.0,
        top_p: Optional[float] = None,
        top_k: Optional[int] = None,
        repetition_penalty: float = 1.0,
        num_beams: int = 1,
        max_new_tokens: int = 128,
        eos_token_id: Optional[Union[int, Sequence[int]]] = None,
        stop_sequences: Optional[Sequence[Sequence[int]]] = None,
        rng_seed: int = 0,
        **kwargs,
    ) -> np.ndarray:
        """Multimodal generate with HF sampling semantics. Returns
        (B, n_new) generated ids (no prompt echo — matching the reference
        model's `generate`, which receives inputs_embeds and returns only
        new tokens; llava_qwen.py:116-136).

        Batch>1: each row of `input_ids` is spliced with its own image(s)
        (per-row entry of `images`/`image_sizes`/`modalities`) and the rows
        are right-padded to one bucket — the functional equivalent of HF's
        left-padding. `stop_sequences` carries "until"-style keyword token
        ids (KeywordsStoppingCriteria, llava/mm_utils.py:372); matching
        inside the jitted loop, so no decode-loop Python round trips.
        """
        ids_arr = _to_numpy(input_ids).astype(np.int64)
        if ids_arr.ndim == 1:
            ids_arr = ids_arr[None]
        batch = ids_arr.shape[0]
        if isinstance(modalities, str):
            modalities = [modalities] * batch

        eos: tuple
        if eos_token_id is None:
            eos = (151645,)  # <|im_end|>
        elif isinstance(eos_token_id, int):
            eos = (eos_token_id,)
        else:
            eos = tuple(eos_token_id)

        # honor attention_mask for pre-left-padded HF-style batches
        rows = []
        for b in range(batch):
            row = ids_arr[b]
            if attention_mask is not None:
                m = _to_numpy(attention_mask)[b].astype(bool)
                row = row[m]
            rows.append(row)

        has_sizes = image_sizes is not None and len(image_sizes) > 0
        embeds_rows = [
            self._row_embeds(
                rows[b],
                None if images is None else (
                    images[b] if isinstance(images, (list, tuple)) else images),
                modalities[b] if b < len(modalities) else modalities[-1],
                list(image_sizes[b:b + 1]) if has_sizes else None,
            )
            for b in range(batch)
        ]

        kn = dict(
            max_new_tokens=max_new_tokens,
            eos_token_ids=eos,
            do_sample=bool(do_sample),
            temperature=float(temperature) if do_sample else 0.0,
            top_p=float(top_p) if (do_sample and top_p is not None) else 1.0,
            top_k=int(top_k) if (do_sample and top_k) else 0,
            repetition_penalty=float(repetition_penalty),
            stop_sequences=tuple(tuple(int(t) for t in s)
                                 for s in (stop_sequences or ())),
            rng=jax.random.key(rng_seed),
        )
        if num_beams > 1:
            from memory_augmented_vlm_tpu.models import beam_search

            rows_out = [
                beam_search.beam_search(
                    self.params, self.cfg, e, num_beams=num_beams,
                    max_new_tokens=max_new_tokens, eos_token_ids=eos,
                    length_penalty=float(kwargs.get("length_penalty", 1.0)),
                    repetition_penalty=float(repetition_penalty),
                    stop_sequences=kn["stop_sequences"],
                    # beam sampling (HF beam_sample): per-row keys so batch
                    # rows draw independently
                    do_sample=kn["do_sample"], temperature=kn["temperature"],
                    top_p=kn["top_p"], top_k=kn["top_k"],
                    rng=jax.random.fold_in(kn["rng"], b))
                for b, e in enumerate(embeds_rows)
            ]
            width = max(1, max(len(r) for r in rows_out))
            result = np.zeros((batch, width), np.int64)
            for b, r in enumerate(rows_out):
                result[b, : len(r)] = r
            return result

        # HF's prompt-lookup assisted generation kwarg: greedy speculative
        # decode drafted from the prompt's text ids (exact same output,
        # fewer LM forwards — vlm.generate_speculative)
        plk = int(kwargs.get("prompt_lookup_num_tokens") or 0)
        if (plk > 1 and batch == 1 and not do_sample
                and repetition_penalty == 1.0 and not kn["stop_sequences"]):
            text_ids = rows[0][rows[0] >= 0]  # drop IMAGE_TOKEN_INDEX (-200)
            out, _ = vlm.generate_speculative(
                self.params, self.cfg, embeds_rows[0], draft_ids=text_ids,
                max_new_tokens=max_new_tokens, eos_token_ids=eos,
                spec_k=plk)
            n = int(out.num_tokens)
            return np.asarray(out.tokens)[:n][None, :]

        if batch == 1:
            out = vlm.generate(self.params, self.cfg, embeds_rows[0], **kn)
            n = int(out.num_tokens)
            return np.asarray(out.tokens)[:n][None, :]

        lens = [int(e.shape[0]) for e in embeds_rows]
        smax = ((max(lens) + 127) // 128) * 128
        stacked = jnp.stack([
            jnp.pad(e, ((0, smax - e.shape[0]), (0, 0))) for e in embeds_rows
        ])
        out = vlm.generate_batched(
            self.params, self.cfg, stacked, jnp.asarray(lens, jnp.int32), **kn)
        nums = np.asarray(out.num_tokens)
        toks = np.asarray(out.tokens)
        width = max(1, int(nums.max()))
        result = np.zeros((batch, width), np.int64)
        for b in range(batch):
            result[b, :nums[b]] = toks[b, :nums[b]]
        return result

    def generate_stream(
        self,
        input_ids,
        images=None,
        modalities: Union[str, Sequence[str]] = "image",
        image_sizes=None,
        do_sample: bool = False,
        temperature: float = 0.0,
        top_p: Optional[float] = None,
        repetition_penalty: float = 1.0,
        max_new_tokens: int = 256,
        eos_token_id: Optional[Union[int, Sequence[int]]] = None,
        stop_sequences: Optional[Sequence[Sequence[int]]] = None,
        chunk_size: int = 8,
        **kwargs,
    ):
        """Yield np.ndarray token-id chunks incrementally (single sample) —
        the worker's TextIteratorStreamer replacement."""
        ids = _to_numpy(input_ids).astype(np.int64)
        if ids.ndim == 2:
            ids = ids[0]
        if isinstance(modalities, str):
            modalities = [modalities]
        if eos_token_id is None:
            eos = (151645,)
        elif isinstance(eos_token_id, int):
            eos = (eos_token_id,)
        else:
            eos = tuple(eos_token_id)
        embeds = self._row_embeds(
            ids, images[0] if isinstance(images, (list, tuple)) else images,
            modalities[0], image_sizes)
        yield from vlm.generate_stream(
            self.params, self.cfg, embeds,
            max_new_tokens=max_new_tokens,
            eos_token_ids=eos,
            do_sample=bool(do_sample),
            temperature=float(temperature) if do_sample else 0.0,
            top_p=float(top_p) if (do_sample and top_p is not None) else 1.0,
            repetition_penalty=float(repetition_penalty),
            stop_sequences=tuple(tuple(int(t) for t in s)
                                 for s in (stop_sequences or ())),
            chunk_size=chunk_size,
        )

    def _row_embeds(self, ids: np.ndarray, images, modality: str,
                    image_sizes) -> "jnp.ndarray":
        """Splice one sample's text ids with its visual stream -> (S, H)."""
        modalities = [modality]
        if images is None or constants.IMAGE_TOKEN_INDEX not in ids:
            embeds = jnp.asarray(
                vlm.qwen2.embed_tokens(
                    self.params["language_model"], jnp.asarray(ids, jnp.int32),
                    self.cfg.lm,
                ),
                self.dtype,
            )
        else:
            img = images[0] if isinstance(images, (list, tuple)) else images
            pixels = _to_numpy(img)
            if pixels.ndim == 3:
                pixels = pixels[None]
            # channel-first torch layout -> channel-last
            if pixels.shape[1] == 3 and pixels.shape[-1] != 3:
                pixels = pixels.transpose(0, 2, 3, 1)
            # raw (uint8) inputs get the reference's process_images treatment
            # here; pre-normalized inputs must already be tower-sized tiles
            s = self.cfg.vision.image_size
            if (pixels.dtype == np.uint8 and modalities[0] == "video"
                    and self.device_preprocess):
                pass  # raw bytes to the chip; resize+normalize in the tower jit
            elif (pixels.dtype == np.uint8 and self.device_preprocess
                    and modalities[0] != "video"
                    and self.cfg.pipeline.image_aspect_ratio.startswith("anyres")):
                from memory_augmented_vlm_tpu.ops.preprocess import (
                    preprocess_anyres_image,
                )

                pixels, auto_size = preprocess_anyres_image(
                    pixels[0], self.cfg.pipeline.image_grid_pinpoints,
                    size=(s, s), dtype=self.dtype)
                if not image_sizes:
                    image_sizes = [auto_size]
            elif pixels.dtype == np.uint8:
                from memory_augmented_vlm_tpu.data.preprocessing import (
                    SigLipImageProcessor,
                    process_anyres_image,
                )

                proc = SigLipImageProcessor(size=(s, s))
                if (modalities[0] != "video"
                        and self.cfg.pipeline.image_aspect_ratio.startswith("anyres")):
                    from PIL import Image

                    pixels, auto_size = process_anyres_image(
                        Image.fromarray(pixels[0]), proc,
                        self.cfg.pipeline.image_grid_pinpoints)
                    if not image_sizes:
                        image_sizes = [auto_size]
                else:
                    pixels = proc.preprocess(pixels)
            elif pixels.shape[1] != s or pixels.shape[2] != s:
                raise ValueError(
                    f"pre-normalized inputs must be {s}x{s} tower tiles, got "
                    f"{pixels.shape}; pass raw uint8 images/frames to let "
                    "generate() run the processor (resize/normalize + anyres)")
            if modalities[0] == "video":
                embeds = vlm.video_qa_embeds(self.params, self.cfg, pixels, ids)
            else:
                # anyres tile stack (base + tiles) from process_anyres_image
                from memory_augmented_vlm_tpu.models.image_path import build_image_embeds_jit
                from memory_augmented_vlm_tpu.models.vlm import splice_image_embeds

                size = None
                if image_sizes:
                    size = tuple(image_sizes[0])
                else:
                    size = (pixels.shape[2], pixels.shape[1])
                visual = build_image_embeds_jit(self.params, self.cfg, pixels,
                                                tuple(size))
                pos = int(np.where(ids == constants.IMAGE_TOKEN_INDEX)[0][0])
                embeds = splice_image_embeds(
                    self.params,
                    jnp.asarray(ids[:pos], jnp.int32),
                    visual,
                    jnp.asarray(ids[pos + 1 :], jnp.int32),
                    self.cfg.lm,
                )
        return embeds
