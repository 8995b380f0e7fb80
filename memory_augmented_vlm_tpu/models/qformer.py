"""Full BLIP-2-style BERT Q-Former resampler, TPU-native.

Capability parity with the reference's vendored Q-Former
(llava/model/multimodal_resampler/qformer.py, 1,160 LoC): a BERT encoder
whose *query-only* path runs learnable query tokens through per-layer
self-attention, cross-attention over vision features every
`cross_attention_freq`-th layer (qformer.py:343-344), and the query FFN
(`intermediate_query`/`output_query`; the text FFN is deleted by
`build_Qformer`, qformer.py:1126-1132). Post-LayerNorm residuals match BERT
(`BertSelfOutput`/`BertOutput`: LayerNorm(dense(x) + residual)).

The parameter tree mirrors the reference checkpoint key structure
(`query_tokens`, `ln_vision.*`, `Qformer.bert.embeddings.LayerNorm.*`,
`Qformer.bert.encoder.layer.{i}.*`) via checkpoint/hf_import.convert_qformer,
so reference-pretrained Q-Former weights load directly. Layers run as a
Python loop (heterogeneous cross-attention placement; depth is 12 and the
module is dormant on the active video path, multimodal_resampler/builder.py:31).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from memory_augmented_vlm_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    """bert-base-uncased geometry with BLIP-2 cross-attention knobs.

    `cross_attention_freq` is the reference's `mm_qformer_depth` CLI arg
    (qformer.py:1110-1117 maps depth -> cross_attention_freq)."""

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    encoder_width: int = 1152          # vision tower hidden size
    num_query_tokens: int = 32         # mm_qformer_latents
    cross_attention_freq: int = 2      # mm_qformer_depth
    layer_norm_eps: float = 1e-12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def _lin_init(k, i, o, dtype, scale=0.02):
    return {"kernel": (jax.random.normal(k, (i, o)) * scale).astype(dtype),
            "bias": jnp.zeros((o,), dtype)}


def _ln_init(h, dtype):
    return {"weight": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)}


def init_params(cfg: QFormerConfig, key: jax.Array, dtype=jnp.float32):
    h, i, w = cfg.hidden_size, cfg.intermediate_size, cfg.encoder_width
    ks = jax.random.split(key, cfg.num_hidden_layers * 10 + 2)
    layers = []
    for ln in range(cfg.num_hidden_layers):
        lk = jax.random.split(ks[ln], 10)
        layer = {
            "attn": {
                "query": _lin_init(lk[0], h, h, dtype),
                "key": _lin_init(lk[1], h, h, dtype),
                "value": _lin_init(lk[2], h, h, dtype),
                "out": _lin_init(lk[3], h, h, dtype),
                "out_ln": _ln_init(h, dtype),
            },
            "ffn_q": {
                "intermediate": _lin_init(lk[4], h, i, dtype),
                "output": _lin_init(lk[5], i, h, dtype),
                "out_ln": _ln_init(h, dtype),
            },
        }
        if ln % cfg.cross_attention_freq == 0:
            layer["xattn"] = {
                "query": _lin_init(lk[6], h, h, dtype),
                "key": _lin_init(lk[7], w, h, dtype),
                "value": _lin_init(lk[8], w, h, dtype),
                "out": _lin_init(lk[9], h, h, dtype),
                "out_ln": _ln_init(h, dtype),
            }
        layers.append(layer)
    return {
        "query_tokens": (jax.random.normal(ks[-1], (cfg.num_query_tokens, h))
                         * 0.02).astype(dtype),
        "ln_vision": _ln_init(w, dtype),
        "embeddings_ln": _ln_init(h, dtype),
        "layers": layers,
    }


def _linear(p, x):
    return jnp.einsum("...i,io->...o", x, p["kernel"]) + p["bias"]


def _bert_attention(ap, cfg: QFormerConfig, q_in: jax.Array, kv_in: jax.Array):
    """BertAttention: MHA + BertSelfOutput (LayerNorm(dense(ctx) + q_in))."""
    b, lq, _ = q_in.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    q = _linear(ap["query"], q_in).reshape(b, lq, nh, hd)
    k = _linear(ap["key"], kv_in).reshape(b, -1, nh, hd)
    v = _linear(ap["value"], kv_in).reshape(b, -1, nh, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / hd**0.5
    probs = jax.nn.softmax(logits, axis=-1).astype(q_in.dtype)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, lq, nh * hd)
    out = _linear(ap["out"], ctx)
    return layer_norm(out + q_in, ap["out_ln"]["weight"], ap["out_ln"]["bias"],
                      cfg.layer_norm_eps)


def forward(params, cfg: QFormerConfig, image_features: jax.Array) -> jax.Array:
    """(B, N, encoder_width) vision features -> (B, Q, hidden) query states.

    The reference's `Qformer.forward` (qformer.py:1135-1148): ln_vision over
    the features, embeddings LayerNorm over the broadcast query tokens, then
    the query-only BertEncoder pass."""
    b = image_features.shape[0]
    x = layer_norm(image_features, params["ln_vision"]["weight"],
                   params["ln_vision"]["bias"], cfg.layer_norm_eps)
    queries = jnp.broadcast_to(params["query_tokens"][None],
                               (b,) + params["query_tokens"].shape)
    hidden = layer_norm(queries.astype(x.dtype),
                        params["embeddings_ln"]["weight"],
                        params["embeddings_ln"]["bias"], cfg.layer_norm_eps)
    for layer in params["layers"]:
        hidden = _bert_attention(layer["attn"], cfg, hidden, hidden)
        if "xattn" in layer:
            hidden = _bert_attention(layer["xattn"], cfg, hidden, x)
        # query FFN (feed_forward_chunk_query): gelu intermediate + BertOutput
        inter = jax.nn.gelu(_linear(layer["ffn_q"]["intermediate"], hidden),
                            approximate=False)
        out = _linear(layer["ffn_q"]["output"], inter)
        hidden = layer_norm(out + hidden, layer["ffn_q"]["out_ln"]["weight"],
                            layer["ffn_q"]["out_ln"]["bias"], cfg.layer_norm_eps)
    return hidden


# ---------------------------------------------------------------------------
# Reference checkpoint import (state_dict key mapping)
# ---------------------------------------------------------------------------

def convert_reference_qformer(sd: dict, cfg: QFormerConfig):
    """Map a reference Qformer state_dict (numpy values, torch key names) to
    the param tree above. Keys per qformer.py:1102-1133: `query_tokens`,
    `ln_vision.{weight,bias}`, `Qformer.bert.embeddings.LayerNorm.*`,
    `Qformer.bert.encoder.layer.{i}.attention.self.{query,key,value}.*`,
    `...attention.output.{dense,LayerNorm}.*`, `...crossattention.*` on
    cross layers, `...intermediate_query.dense.*`, `...output_query.*`."""

    def lin(prefix):
        return {"kernel": jnp.asarray(sd[prefix + ".weight"]).T,
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    def ln(prefix):
        return {"weight": jnp.asarray(sd[prefix + ".weight"]),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    layers = []
    for i in range(cfg.num_hidden_layers):
        base = f"Qformer.bert.encoder.layer.{i}"
        layer = {
            "attn": {
                "query": lin(f"{base}.attention.self.query"),
                "key": lin(f"{base}.attention.self.key"),
                "value": lin(f"{base}.attention.self.value"),
                "out": lin(f"{base}.attention.output.dense"),
                "out_ln": ln(f"{base}.attention.output.LayerNorm"),
            },
            "ffn_q": {
                "intermediate": lin(f"{base}.intermediate_query.dense"),
                "output": lin(f"{base}.output_query.dense"),
                "out_ln": ln(f"{base}.output_query.LayerNorm"),
            },
        }
        if i % cfg.cross_attention_freq == 0:
            layer["xattn"] = {
                "query": lin(f"{base}.crossattention.self.query"),
                "key": lin(f"{base}.crossattention.self.key"),
                "value": lin(f"{base}.crossattention.self.value"),
                "out": lin(f"{base}.crossattention.output.dense"),
                "out_ln": ln(f"{base}.crossattention.output.LayerNorm"),
            }
        layers.append(layer)
    return {
        "query_tokens": jnp.asarray(sd["query_tokens"])[0],
        "ln_vision": ln("ln_vision"),
        "embeddings_ln": ln("Qformer.bert.embeddings.LayerNorm"),
        "layers": layers,
    }
