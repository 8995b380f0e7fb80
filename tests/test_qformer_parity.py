"""Full BERT Q-Former parity against the reference's vendored implementation
(llava/model/multimodal_resampler/qformer.py), loaded directly from the
reference tree and driven through the same query-only path the `Qformer`
wrapper uses (qformer.py:1135-1148). Weights transfer through the reference
state_dict key names, proving reference-pretrained Q-Former checkpoints load.
"""

import importlib.util
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from memory_augmented_vlm_tpu.models.qformer import (
    QFormerConfig,
    convert_reference_qformer,
    forward,
)

_REF = "/root/reference/llava/model/multimodal_resampler/qformer.py"

TINY = QFormerConfig(
    hidden_size=32,
    num_hidden_layers=4,
    num_attention_heads=4,
    intermediate_size=64,
    encoder_width=24,
    num_query_tokens=8,
    cross_attention_freq=2,
)


@pytest.fixture(scope="module")
def ref_pair():
    if not os.path.exists(_REF):
        pytest.skip("reference repo not present")
    # newer transformers moved these helpers to pytorch_utils; shim them back
    # so the (older-API) reference module imports
    import transformers.modeling_utils as _mu
    import transformers.pytorch_utils as _pu

    for _name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                  "prune_linear_layer"):
        if not hasattr(_mu, _name):
            setattr(_mu, _name, getattr(_pu, _name))
    spec = importlib.util.spec_from_file_location("ref_qformer", _REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from transformers.models.bert.configuration_bert import BertConfig

    enc_cfg = BertConfig(
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        intermediate_size=TINY.intermediate_size,
        vocab_size=128,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    enc_cfg.encoder_width = TINY.encoder_width
    enc_cfg.add_cross_attention = True
    enc_cfg.cross_attention_freq = TINY.cross_attention_freq
    enc_cfg.query_length = TINY.num_query_tokens

    torch.manual_seed(0)
    qformer = mod.BertLMHeadModel(config=enc_cfg)
    query_tokens = torch.nn.Parameter(
        torch.randn(1, TINY.num_query_tokens, TINY.hidden_size) * 0.02)
    ln_vision = torch.nn.LayerNorm(TINY.encoder_width)
    with torch.no_grad():
        ln_vision.weight.mul_(0).add_(torch.rand_like(ln_vision.weight) + 0.5)
        ln_vision.bias.add_(torch.randn_like(ln_vision.bias) * 0.1)
    # build_Qformer surgery (qformer.py:1126-1132)
    qformer.cls = None
    qformer.bert.embeddings.word_embeddings = None
    qformer.bert.embeddings.position_embeddings = None
    for layer in qformer.bert.encoder.layer:
        layer.output = None
        layer.intermediate = None
    qformer.eval()

    # reference-style flat state dict
    sd = {"query_tokens": query_tokens.detach().numpy(),
          "ln_vision.weight": ln_vision.weight.detach().numpy(),
          "ln_vision.bias": ln_vision.bias.detach().numpy()}
    for k, v in qformer.state_dict().items():
        sd["Qformer." + k] = v.detach().numpy()
    params = convert_reference_qformer(sd, TINY)
    return (qformer, query_tokens, ln_vision), params


def _reference_forward(ref, feats):
    qformer, query_tokens, ln_vision = ref
    with torch.no_grad():
        x = ln_vision(torch.from_numpy(feats))
        image_atts = torch.ones(x.size()[:-1], dtype=torch.long)
        q = query_tokens.expand(x.shape[0], -1, -1)
        out = qformer.bert(
            query_embeds=q,
            encoder_hidden_states=x,
            encoder_attention_mask=image_atts,
            return_dict=True,
        )
    return out.last_hidden_state.numpy()


def test_qformer_matches_reference(ref_pair):
    ref, params = ref_pair
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 16, TINY.encoder_width)).astype(np.float32)
    want = _reference_forward(ref, feats)
    got = np.asarray(forward(params, TINY, jnp.asarray(feats)))
    assert got.shape == (2, TINY.num_query_tokens, TINY.hidden_size)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_qformer_cross_attention_placement(ref_pair):
    _, params = ref_pair
    flags = ["xattn" in layer for layer in params["layers"]]
    assert flags == [i % TINY.cross_attention_freq == 0
                     for i in range(TINY.num_hidden_layers)]


def test_qformer_resampler_registry():
    import jax

    from memory_augmented_vlm_tpu.models import resampler

    params = resampler.init_params("qformer", jax.random.key(0), hidden=24,
                                   latents=8, depth=4, heads=4)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((2, 16, 24)).astype(np.float32))
    out = resampler.forward(params, "qformer", x)
    assert out.shape[0] == 2 and out.shape[1] == 8
