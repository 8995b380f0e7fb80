"""Int8 tower path tests (load_8bit equivalent)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from memory_augmented_vlm_tpu.config import VisionConfig
from memory_augmented_vlm_tpu.models import siglip


def test_int8_tower_close_to_bf16():
    cfg = VisionConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                       num_attention_heads=4, image_size=56, patch_size=14)
    params = siglip.init_params(cfg, jax.random.key(0))
    px = jnp.asarray(np.random.default_rng(0).standard_normal((2, 56, 56, 3)),
                     jnp.float32)
    ref = siglip.forward(params, cfg, px)
    q = siglip.forward(params, cfg, px, int8=True)
    rel = float(jnp.mean(jnp.abs(q - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.05, rel
    # jit-able
    jf = jax.jit(lambda p, x: siglip.forward(p, cfg, x, int8=True))
    q2 = jf(params, px)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), rtol=1e-4, atol=1e-4)


def test_load_8bit_flag_sets_config(tmp_path):
    from tests.test_builder_roundtrip import ckpt_dir
    # build inline checkpoint via fixture function
    class F:
        def mktemp(self, name):
            p = tmp_path / name
            p.mkdir()
            return p

    d = ckpt_dir.__wrapped__(F())
    from memory_augmented_vlm_tpu.eval.builder import load_pretrained_model

    _, model, _, _ = load_pretrained_model(str(d), None, "llava_qwen",
                                           torch_dtype="float32", load_8bit=True)
    assert model.cfg.pipeline.tower_int8 is True


def test_prequantized_int8_tower_drift_bounded():
    """Static-scale int8 tower (load_8bit serving mode): output drift vs the
    fp32 tower stays in the 1e-2 RMS class (same tolerance class as bf16-MXU;
    numerics rule in CLAUDE.md)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from memory_augmented_vlm_tpu.config import VisionConfig
    from memory_augmented_vlm_tpu.models import siglip

    cfg = VisionConfig(image_size=56)
    params = siglip.init_params(cfg, jax.random.key(0), dtype=jnp.float32)
    qparams = siglip.prequantize_int8(params)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 56, 56, 3)),
                    jnp.float32)
    ref = np.asarray(siglip.forward(params, cfg, x), np.float32)
    got = np.asarray(siglip.forward(qparams, cfg, x, int8=True), np.float32)
    rms_ratio = np.abs(got - ref).std() / ref.std()
    assert rms_ratio < 0.05, rms_ratio
    # quantized params must be genuinely int8 (memory halves)
    assert qparams["layers"]["fc1"]["kernel_int8"].dtype == jnp.int8
