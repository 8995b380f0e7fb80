"""Web UI, tokenizer init, eval bridge surface tests."""

import json
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from memory_augmented_vlm_tpu.config import LMConfig
from memory_augmented_vlm_tpu.models import qwen2
from memory_augmented_vlm_tpu.models.tokenizer_init import (
    initialize_vision_tokenizer,
    resize_token_embeddings,
)

TINY_LM = LMConfig(vocab_size=100, hidden_size=16, intermediate_size=32,
                   num_hidden_layers=1, num_attention_heads=2,
                   num_key_value_heads=1, head_dim=8, rope_theta=10000.0,
                   tie_word_embeddings=False, dtype="float32")


def test_resize_embeddings_mean_init():
    lm = qwen2.init_params(TINY_LM, jax.random.key(0))
    grown = resize_token_embeddings(lm, 103, tie_word_embeddings=False)
    assert grown["embed_tokens"].shape == (103, 16)
    mean = np.asarray(lm["embed_tokens"]).mean(axis=0)
    np.testing.assert_allclose(np.asarray(grown["embed_tokens"][100]), mean,
                               rtol=1e-5)
    assert grown["lm_head"].shape == (16, 103)
    np.testing.assert_allclose(
        np.asarray(grown["lm_head"][:, 102]),
        np.asarray(lm["lm_head"]).mean(axis=1), rtol=1e-5)


def test_initialize_vision_tokenizer():
    from tests.test_data_pipeline import FakeTokenizer

    class FT(FakeTokenizer):
        def __len__(self):
            return 100 + self._added

        def add_tokens(self, toks, special_tokens=False):
            self._added = getattr(self, "_added", 0) + len(toks)
            return len(toks)

    tok = FT()
    tok._added = 0
    params = {"language_model": qwen2.init_params(TINY_LM, jax.random.key(0))}
    out, tok = initialize_vision_tokenizer(
        params, tok, tie_word_embeddings=False,
        mm_use_im_patch_token=True, mm_use_im_start_end=True)
    assert out["language_model"]["embed_tokens"].shape == (103, 16)


def test_web_ui_serves_page_and_proxies():
    from http.server import ThreadingHTTPServer

    from memory_augmented_vlm_tpu.serve.controller import serve as serve_controller
    from memory_augmented_vlm_tpu.serve.web_server import make_handler

    ctrl = serve_controller("127.0.0.1", 0)
    threading.Thread(target=ctrl.serve_forever, daemon=True).start()
    ctrl_addr = f"http://127.0.0.1:{ctrl.server_address[1]}"

    ui = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(ctrl_addr))
    threading.Thread(target=ui.serve_forever, daemon=True).start()
    ui_addr = f"http://127.0.0.1:{ui.server_address[1]}"

    page = urllib.request.urlopen(ui_addr).read().decode()
    assert "mavlm_tpu chat" in page
    req = urllib.request.Request(ui_addr + "/proxy/list_models",
                                 data=b"{}")
    out = json.loads(urllib.request.urlopen(req).read())
    assert out == {"models": []}


def test_eval_bridge_fallback(tmp_path):
    from memory_augmented_vlm_tpu.eval.eval_bridge import evaluate_checkpoint

    with pytest.raises(RuntimeError, match="question_file"):
        evaluate_checkpoint(str(tmp_path), output_dir=str(tmp_path / "out"))


@pytest.mark.parametrize("ptype", ["mlp2x_res2x_gelu", "pooler", "linear",
                                   "identity", "mlp3x_gelu"])
def test_projector_variants(ptype):
    """Every accepted mm_projector_type initializes and maps (B, L, Din) ->
    (B, L', Dout) with finite outputs (builder.py:20-30 name grammar)."""
    from memory_augmented_vlm_tpu.models import projector

    din, dout = 48, 64
    key = jax.random.key(0)
    p = projector.init_params(ptype, din, dout, key)
    x = jax.random.normal(jax.random.key(1), (2, 36, din))  # 6x6 grid
    y = projector.forward(p, ptype, x)
    assert y.ndim == 3 and y.shape[0] == 2
    if ptype == "identity":
        assert y.shape[-1] == din
    else:
        assert y.shape[-1] == dout
    if ptype == "pooler":
        assert y.shape[1] == 9  # 2x2 pool of the 6x6 grid
    else:
        assert y.shape[1] == 36
    assert bool(jnp.isfinite(y).all())
    if ptype == "mlp2x_res2x_gelu":
        assert len(p["res_blocks"]) == 2


def test_res_projector_differs_from_plain_mlp():
    from memory_augmented_vlm_tpu.models import projector

    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (1, 4, 32))
    p_res = projector.init_params("mlp2x_res1x_gelu", 32, 32, key)
    p_mlp = {k: v for k, v in p_res.items() if k != "res_blocks"}
    y_res = projector.forward(p_res, "mlp2x_res1x_gelu", x)
    y_mlp = projector.forward(p_mlp, "mlp2x_gelu", x)
    assert not np.allclose(np.asarray(y_res), np.asarray(y_mlp))
