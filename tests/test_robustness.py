"""Robustness edge cases: PE overflow clamping, torch-tensor inputs,
worker video path, collator degenerate cases."""

import base64
import io
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from memory_augmented_vlm_tpu import constants
from memory_augmented_vlm_tpu.models import vlm
from tests.test_vlm import TINY


def test_pe_indices_beyond_table_clamp():
    """Frames sampled beyond max_temporal_frames clamp instead of NaN
    (reference raises; under jit we clamp and document)."""
    params = vlm.init_params(TINY, jax.random.key(0))
    from memory_augmented_vlm_tpu.models.position_encoding import add_temporal_pe

    feats = jnp.ones((3, 4, 32))
    idx = jnp.asarray([0, 100, 10_000])  # table is 64 long
    out = add_temporal_pe(params["positional_encoding"], feats, idx)
    assert bool(jnp.isfinite(out).all())


def test_eval_model_accepts_torch_tensors():
    from memory_augmented_vlm_tpu.eval.model import MavlmForCausalLM

    params = vlm.init_params(TINY, jax.random.key(0))
    model = MavlmForCausalLM(params, TINY, dtype=jnp.float32)
    ids = torch.tensor([[10, constants.IMAGE_TOKEN_INDEX, 12]])
    # torch channel-first video tensor
    frames = torch.randn(6, 3, 56, 56)
    out = model.generate(ids, images=[frames], modalities=["video"],
                         max_new_tokens=3, eos_token_id=49999)
    assert out.shape[0] == 1 and out.shape[1] <= 3


def test_worker_video_base64_path(tmp_path):
    """Worker decodes multi-image base64 payloads as video."""
    from tests.test_builder_roundtrip import ckpt_dir

    class F:
        def mktemp(self, name):
            p = tmp_path / name
            p.mkdir()
            return p

    d = ckpt_dir.__wrapped__(F())
    from memory_augmented_vlm_tpu.serve.model_worker import ModelWorker
    from PIL import Image

    worker = ModelWorker(None, "local", str(d), model_name="t", register=False)
    rng = np.random.default_rng(0)
    images = []
    for _ in range(3):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (56, 56, 3), dtype=np.uint8)).save(
            buf, format="PNG")
        images.append(base64.b64encode(buf.getvalue()).decode())
    chunks = list(worker.generate_stream({
        "prompt": "<image>\ndescribe", "images": images, "max_new_tokens": 3}))
    out = json.loads(chunks[-1].rstrip(b"\0"))
    assert out["error_code"] == 0


def test_collator_rejects_empty_and_single():
    from memory_augmented_vlm_tpu.data.collator import collate_text_batch

    enc = {"input_ids": np.array([1, 2, 3]), "labels": np.array([1, 2, 3])}
    b = collate_text_batch([enc])
    assert b["input_ids"].shape[0] == 1 and b["text_len"][0] == 3


def test_generate_zero_max_new_tokens():
    params = vlm.init_params(TINY, jax.random.key(0))
    emb = jnp.ones((5, 32), jnp.float32)
    out = vlm.generate(params, TINY, emb, max_new_tokens=1,
                       eos_token_ids=(49999,), pad_to_multiple=8)
    assert out.tokens.shape == (1,)


def test_eval_model_preprocesses_raw_uint8_image():
    """Raw uint8 images get the processor + anyres treatment inside
    generate(); pre-normalized wrong-size floats are rejected clearly."""
    from memory_augmented_vlm_tpu.eval.model import MavlmForCausalLM

    params = vlm.init_params(TINY, jax.random.key(0))
    model = MavlmForCausalLM(params, TINY, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = torch.tensor([[10, constants.IMAGE_TOKEN_INDEX, 12]])
    raw = rng.integers(0, 255, (120, 90, 3), dtype=np.uint8)  # not tower size
    out = model.generate(ids, images=[raw], modalities=["image"],
                         max_new_tokens=2, eos_token_id=49999)
    assert out.shape[0] == 1
    # raw video frames too
    frames = rng.integers(0, 255, (6, 100, 100, 3), dtype=np.uint8)
    out = model.generate(ids, images=[frames], modalities=["video"],
                         max_new_tokens=2, eos_token_id=49999)
    assert out.shape[0] == 1
    # normalized floats at the wrong size -> actionable error
    bad = rng.standard_normal((1, 100, 100, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="tower tiles"):
        model.generate(ids, images=[bad], modalities=["image"],
                       max_new_tokens=2, eos_token_id=49999)
