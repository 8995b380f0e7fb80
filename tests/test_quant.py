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


def test_prequantized_int8_lm_decode_drift_bounded():
    """lm_int8 (the load_8bit LM half): logits drift vs fp32 stays in the
    1e-2 RMS class and cached decode still matches full forward."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from memory_augmented_vlm_tpu.config import LMConfig
    from memory_augmented_vlm_tpu.models import qwen2

    cfg = LMConfig(vocab_size=50000, hidden_size=64, intermediate_size=128,
                   num_hidden_layers=3, num_attention_heads=4,
                   num_key_value_heads=2, head_dim=16, rope_theta=10000.0)
    params = qwen2.init_params(cfg, jax.random.key(0))
    qparams = qwen2.prequantize_int8(params, cfg)
    assert qparams["layers"]["up_proj"]["kernel_int8"].dtype == jnp.int8
    assert "bias" in qparams["layers"]["q_proj"]  # qwen keeps qkv biases

    ids = np.random.default_rng(0).integers(0, 1000, size=(1, 12))
    emb = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(12)[None]
    ref = np.asarray(qwen2.unembed(
        params, cfg, qwen2.forward(params, cfg, emb, pos)[0]))
    got = np.asarray(qwen2.unembed(
        qparams, cfg, qwen2.forward(qparams, cfg, emb, pos)[0]))
    rms = np.abs(got - ref).std() / ref.std()
    assert rms < 0.05, rms

    # cached decode consistency within the quantized model itself
    hidden_full, _ = qwen2.forward(qparams, cfg, emb, pos)
    _, cache = qwen2.forward(qparams, cfg, emb[:, :8], pos[:, :8],
                             cache_max_len=16)
    outs = []
    for t in range(8, 12):
        h, cache = qwen2.decode_step(qparams, cfg, emb[:, t:t + 1], cache)
        outs.append(np.asarray(h)[:, 0])
    np.testing.assert_allclose(np.stack(outs, axis=1),
                               np.asarray(hidden_full)[:, 8:12],
                               rtol=2e-4, atol=2e-4)


def _greedy_decode(params, cfg, ids, n_new, kv_int8=False):
    """Greedy continuation via the same prefill+decode_step spine bench.py
    uses; returns (tokens (B, n_new), prefill last-position logits)."""
    from memory_augmented_vlm_tpu.models import qwen2

    b, s = ids.shape
    emb = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    hidden, cache = qwen2.forward(params, cfg, emb, pos,
                                  cache_max_len=s + n_new)
    logits0 = np.asarray(qwen2.unembed(params, cfg, hidden[:, -1:]))[:, 0]
    if kv_int8:
        cache = qwen2.quantize_cache(cache)
    logits = jnp.asarray(logits0)
    toks = []
    for _ in range(n_new):
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks.append(np.asarray(tok))
        emb_t = qwen2.embed_tokens(params, tok[:, None], cfg)
        h, cache = qwen2.decode_step(params, cfg, emb_t, cache)
        logits = qwen2.unembed(params, cfg, h)[:, 0]
    return np.stack(toks, axis=1), logits0


def test_serving_int8_greedy_agreement_and_logit_drift():
    """Qualify the full int8 serving config (dense kernels + unembed + KV
    cache all int8 — bench.py's load_8bit-analogue headline mode) against
    the unquantized path over a prompt corpus: greedy token agreement must
    stay high and prefill logit drift in the 1e-2 RMS class.

    This is the numerics gate VERDICT.md round 3 asked for before
    promoting the int8 config to the serving headline."""
    from memory_augmented_vlm_tpu.config import LMConfig
    from memory_augmented_vlm_tpu.models import qwen2

    cfg = LMConfig(vocab_size=50000, hidden_size=64, intermediate_size=128,
                   num_hidden_layers=3, num_attention_heads=4,
                   num_key_value_heads=2, head_dim=16, rope_theta=10000.0)
    params = qwen2.init_params(cfg, jax.random.key(0))
    qparams = qwen2.prequantize_int8(params, cfg, include_unembed=True)
    assert qparams["unembed_int8"].dtype == jnp.int8
    assert qparams["unembed_scale"].shape == (cfg.vocab_size,)

    ids = np.random.default_rng(0).integers(0, 49000, size=(8, 16))
    ref_toks, ref_logits = _greedy_decode(params, cfg, ids, 12)
    got_toks, got_logits = _greedy_decode(qparams, cfg, ids, 12, kv_int8=True)

    drift = np.abs(got_logits - ref_logits).std() / ref_logits.std()
    assert drift < 0.05, drift
    agreement = float((ref_toks == got_toks).mean())
    # random tiny weights are the WORST case for argmax stability (top-1/2
    # gap ~ sigma/sqrt(2 ln V)); trained logit margins are far wider
    assert agreement >= 0.85, agreement


def test_int8_unembed_untied_lm():
    """Untied models (7B class): include_unembed quantizes lm_head, drops
    the dense copy, and unembed output stays in the int8 drift class."""
    from memory_augmented_vlm_tpu.config import LMConfig
    from memory_augmented_vlm_tpu.models import qwen2

    cfg = LMConfig(vocab_size=4096, hidden_size=64, intermediate_size=128,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, head_dim=16,
                   tie_word_embeddings=False)
    params = qwen2.init_params(cfg, jax.random.key(1))
    qparams = qwen2.prequantize_int8(params, cfg, include_unembed=True)
    assert "lm_head" not in qparams
    h = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 3, 64)), jnp.float32)
    ref = np.asarray(qwen2.unembed(params, cfg, h))
    got = np.asarray(qwen2.unembed(qparams, cfg, h))
    assert np.abs(got - ref).std() / ref.std() < 0.02


def test_int4_pack_unpack_roundtrip():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from memory_augmented_vlm_tpu.ops.quant import (
        prequantize_kernel_int4,
        unpack_int4,
    )

    w = jax.random.normal(jax.random.key(0), (3, 16, 8)) * 0.1
    packed, scale = prequantize_kernel_int4(w)
    assert packed.shape == (3, 8, 8) and packed.dtype == jnp.uint8
    deq = unpack_int4(packed).astype(jnp.float32) * scale[:, None, :]
    err = np.abs(np.asarray(deq) - np.asarray(w))
    step = np.asarray(scale).max()
    assert err.max() <= step * 0.51 + 1e-6  # within half a quant step


def test_prequantized_int4_lm_drift_bounded():
    """load_4bit: packed-int4 LM weights halve int8 storage; logits drift
    stays bounded (coarser than int8 but finite and decode-consistent)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from memory_augmented_vlm_tpu.config import LMConfig
    from memory_augmented_vlm_tpu.models import qwen2

    cfg = LMConfig(vocab_size=50000, hidden_size=64, intermediate_size=128,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, head_dim=16, rope_theta=10000.0)
    params = qwen2.init_params(cfg, jax.random.key(0))
    q4 = qwen2.prequantize_int8(params, cfg, bits=4)
    assert q4["layers"]["up_proj"]["kernel_int4"].dtype == jnp.uint8
    # half the int8 byte count
    assert (q4["layers"]["up_proj"]["kernel_int4"].size
            == params["layers"]["up_proj"]["kernel"].size // 2)

    ids = np.random.default_rng(0).integers(0, 1000, size=(1, 10))
    emb = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.arange(10)[None]
    ref = np.asarray(qwen2.unembed(
        params, cfg, qwen2.forward(params, cfg, emb, pos)[0]))
    got = np.asarray(qwen2.unembed(
        q4, cfg, qwen2.forward(q4, cfg, emb, pos)[0]))
    rms = np.abs(got - ref).std() / ref.std()
    assert rms < 0.15, rms
