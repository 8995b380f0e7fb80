"""Device-side preprocessing (ops/preprocess.py) vs the host PIL path
(data/preprocessing.py, reference siglip_encoder.py:34-67 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from memory_augmented_vlm_tpu.data.preprocessing import SigLipImageProcessor
from memory_augmented_vlm_tpu.ops.preprocess import preprocess_frames


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_identity_size_matches_host_exactly(rng):
    """No resize -> only rescale+normalize; fp32 device path matches the
    host processor to float rounding."""
    frames = rng.integers(0, 256, (3, 384, 384, 3), dtype=np.uint8)
    host = SigLipImageProcessor().preprocess(frames)
    dev = np.asarray(preprocess_frames(jnp.asarray(frames), dtype=jnp.float32))
    np.testing.assert_allclose(dev, host, atol=1e-6)


@pytest.mark.parametrize("hw", [(480, 640), (256, 256)], ids=["down", "up"])
def test_resize_matches_host_within_quantization(rng, hw):
    """PIL quantizes the resized image to uint8 before normalize; the
    device path stays float. On the normalized scale (std=0.5) one uint8
    step is 2/255 ~ 0.0078 — allow a few steps for kernel boundary
    differences, and require the bulk to agree tightly."""
    frames = rng.integers(0, 256, (2, *hw, 3), dtype=np.uint8)
    host = SigLipImageProcessor().preprocess(frames)
    dev = np.asarray(preprocess_frames(jnp.asarray(frames), dtype=jnp.float32))
    assert dev.shape == host.shape == (2, 384, 384, 3)
    diff = np.abs(dev - host)
    assert np.mean(diff) < 0.01, np.mean(diff)
    assert np.quantile(diff, 0.99) < 0.05, np.quantile(diff, 0.99)


def test_jit_and_bf16(rng):
    frames = rng.integers(0, 256, (2, 200, 320, 3), dtype=np.uint8)
    out = jax.jit(lambda f: preprocess_frames(f, size=(384, 384)))(
        jnp.asarray(frames))
    assert out.dtype == jnp.bfloat16 and out.shape == (2, 384, 384, 3)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
    # normalized range for mean=std=0.5 is [-1, 1]
    assert float(jnp.max(jnp.abs(out.astype(jnp.float32)))) <= 1.0 + 1e-2


def test_uint8_video_path_end_to_end(rng):
    """vlm.video_qa_embeds accepts raw uint8 frames and produces the same
    spliced sequence (to preprocessing-quantization tolerance) as the
    host-preprocessed path."""
    from memory_augmented_vlm_tpu import constants
    from memory_augmented_vlm_tpu.models import vlm
    from tests.test_vlm import TINY as cfg

    params = vlm.init_params(cfg, jax.random.key(0))
    f = cfg.memory.segment_frames
    frames_u8 = rng.integers(0, 256, (f, 64, 48, 3), dtype=np.uint8)
    s = cfg.vision.image_size
    host_px = SigLipImageProcessor(size=(s, s)).preprocess(frames_u8)
    ids = np.array([5, 7, constants.IMAGE_TOKEN_INDEX, 11], np.int64)

    a = np.asarray(vlm.video_qa_embeds(params, cfg, host_px, ids),
                   np.float32)
    b = np.asarray(vlm.video_qa_embeds(params, cfg, frames_u8, ids),
                   np.float32)
    assert a.shape == b.shape
    # identical pipeline after preprocessing; differences bounded by the
    # PIL-uint8-requantize delta through one tower forward
    denom = np.sqrt(np.mean(a * a)) + 1e-6
    rel = np.sqrt(np.mean((a - b) ** 2)) / denom
    assert rel < 0.15, rel


def test_anyres_device_matches_host(rng):
    """preprocess_anyres_image (device) mirrors process_anyres_image
    (host PIL) geometry exactly and values within the quantization
    envelope."""
    from PIL import Image

    from memory_augmented_vlm_tpu.data.preprocessing import (
        process_anyres_image,
    )
    from memory_augmented_vlm_tpu.ops.preprocess import (
        preprocess_anyres_image,
    )

    img_u8 = rng.integers(0, 256, (500, 700, 3), dtype=np.uint8)
    proc = SigLipImageProcessor()
    host, host_size = process_anyres_image(
        Image.fromarray(img_u8), proc, "(1x1),...,(3x3)")
    dev, dev_size = preprocess_anyres_image(
        img_u8, "(1x1),...,(3x3)", dtype=jnp.float32)
    assert host_size == dev_size == (700, 500)
    assert host.shape == dev.shape
    diff = np.abs(np.asarray(dev) - host)
    assert np.mean(diff) < 0.015, np.mean(diff)
    assert np.quantile(diff, 0.99) < 0.08, np.quantile(diff, 0.99)


def test_anyres_device_generate(rng):
    """generate() with device_preprocess=True runs the anyres image path
    fully on-device."""
    import dataclasses

    from memory_augmented_vlm_tpu import constants
    from memory_augmented_vlm_tpu.eval.model import MavlmForCausalLM
    from memory_augmented_vlm_tpu.models import vlm
    from tests.test_vlm import TINY

    cfg = dataclasses.replace(
        TINY, pipeline=dataclasses.replace(
            TINY.pipeline, image_aspect_ratio="anyres_max_9",
            image_grid_pinpoints="(1x1),...,(2x2)"))
    params = vlm.init_params(cfg, jax.random.key(0))
    model = MavlmForCausalLM(params, cfg, dtype=jnp.float32,
                             device_preprocess=True)
    ids = np.array([[10, constants.IMAGE_TOKEN_INDEX, 12]])
    img = rng.integers(0, 256, (90, 70, 3), dtype=np.uint8)
    out = model.generate(ids, images=[img[None]], modalities=["image"],
                         max_new_tokens=3, eos_token_id=49999)
    assert out.shape[0] == 1 and out.shape[1] <= 3


def test_worker_device_preprocess_video(rng, tmp_path):
    """ModelWorker(device_preprocess=True) streams a base64 video payload
    through the raw-uint8 device path."""
    import base64
    import io
    import json

    from PIL import Image

    from tests.test_builder_roundtrip import ckpt_dir
    from memory_augmented_vlm_tpu.serve.model_worker import ModelWorker

    class F:
        def mktemp(self, name):
            p = tmp_path / name
            p.mkdir()
            return p

    d = ckpt_dir.__wrapped__(F())
    worker = ModelWorker(None, "local", str(d), model_name="t",
                         register=False, device_preprocess=True)
    images = []
    for _ in range(3):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (40, 30, 3), dtype=np.uint8)).save(
                buf, format="PNG")
        images.append(base64.b64encode(buf.getvalue()).decode())
    chunks = list(worker.generate_stream({
        "prompt": "<image>\ndescribe", "images": images,
        "max_new_tokens": 3}))
    out = json.loads(chunks[-1].rstrip(b"\0"))
    assert out["error_code"] == 0

    # mixed frame sizes fall back to the host processor (which resizes
    # each frame BEFORE stacking) instead of crashing on a ragged stack
    buf = io.BytesIO()
    Image.fromarray(
        rng.integers(0, 256, (56, 56, 3), dtype=np.uint8)).save(
            buf, format="PNG")
    mixed = images + [base64.b64encode(buf.getvalue()).decode()]
    chunks = list(worker.generate_stream({
        "prompt": "<image>\ndescribe", "images": mixed,
        "max_new_tokens": 3}))
    out = json.loads(chunks[-1].rstrip(b"\0"))
    assert out["error_code"] == 0


def test_eval_generate_device_preprocess(rng):
    """MavlmForCausalLM(device_preprocess=True) ships raw uint8 video
    frames straight to the chip and still generates."""
    from memory_augmented_vlm_tpu import constants
    from memory_augmented_vlm_tpu.eval.model import MavlmForCausalLM
    from memory_augmented_vlm_tpu.models import vlm
    from tests.test_vlm import TINY

    params = vlm.init_params(TINY, jax.random.key(0))
    model = MavlmForCausalLM(params, TINY, dtype=jnp.float32,
                             device_preprocess=True)
    ids = np.array([[10, constants.IMAGE_TOKEN_INDEX, 12]])
    frames = rng.integers(0, 256, (6, 60, 80, 3), dtype=np.uint8)
    out = model.generate(ids, images=[frames], modalities=["video"],
                         max_new_tokens=3, eos_token_id=49999)
    assert out.shape[0] == 1 and out.shape[1] <= 3
