"""Load the reference implementation itself as a parity oracle.

Every other parity asset in this repo compares against *re-derivations* of
the reference semantics (torch oracles written from the reference's code, or
self-pinned goldens).  This module closes the loop: it imports the actual
reference package from ``/root/reference`` (read-only), instantiates a
tiny-width — but geometry-preserving (384px/14patch -> 729 tokens/frame,
196 after the 2x2 pool) — ``LlavaQwenForCausalLM``, and converts its live
``state_dict()`` into this repo's param pytree, so both frameworks can be
driven end-to-end on identical weights and inputs.

The reference package cannot be imported wholesale offline
(``llava/__init__.py`` pulls every LM wrapper and the vendored Q-Former,
which target an older ``transformers``).  ``import_reference_llava`` builds
stub package namespaces so only the modules the active video spine needs are
executed (llava_arch.py, llava_qwen.py, the tower/projector builders and the
memory modules), with the dormant Q-Former replaced by a placeholder.

Used by ``tests/test_reference_spine.py`` and
``tools/pin_goldens.py --from-reference``.
"""

from __future__ import annotations

import dataclasses
import sys
import types
from typing import Optional

import numpy as np

REFERENCE_ROOT = "/root/reference"

_NAMESPACE_PACKAGES = (
    ("llava", "/llava"),
    ("llava.model", "/llava/model"),
    ("llava.model.language_model", "/llava/model/language_model"),
)


def reference_available(root: str = REFERENCE_ROOT) -> bool:
    import os

    return os.path.isdir(os.path.join(root, "llava", "model"))


def import_reference_llava(root: str = REFERENCE_ROOT):
    """Import the reference's llava_arch + llava_qwen without the package
    ``__init__`` chain.  Returns (llava_arch_module, llava_qwen_module).

    Idempotent: repeated calls reuse the already-imported modules.
    """
    if "llava.model.llava_arch" in sys.modules and (
            "llava.model.language_model.llava_qwen" in sys.modules):
        return (sys.modules["llava.model.llava_arch"],
                sys.modules["llava.model.language_model.llava_qwen"])

    for name, path in _NAMESPACE_PACKAGES:
        pkg = sys.modules.get(name)
        if pkg is None:
            pkg = types.ModuleType(name)
            sys.modules[name] = pkg
        # other tests install lightweight `llava` stubs (e.g. the eva_clip
        # oracle stubs `llava.utils` for rank0_print) without a __path__;
        # upgrade them in place so submodule imports resolve against the
        # reference tree regardless of test ordering
        if root + path not in getattr(pkg, "__path__", []):
            pkg.__path__ = list(getattr(pkg, "__path__", [])) + [root + path]
    # evict any non-reference llava.* stub (other tests install e.g. a
    # one-function llava.utils for the eva_clip oracle); the real module
    # then loads from the reference tree on demand
    for name, mod in list(sys.modules.items()):
        if (name.startswith("llava.") and mod is not None
                and "qformer" not in name
                and not getattr(mod, "__path__", None)
                and not str(getattr(mod, "__file__", "") or "").startswith(root)):
            del sys.modules[name]

    # The vendored BERT Q-Former targets transformers<4.30
    # (apply_chunking_to_forward); it is dormant on the active path
    # (mm_resampler_type=None -> IdentityMap), so stub it.
    qf_name = "llava.model.multimodal_resampler.qformer"
    if qf_name not in sys.modules:
        qf = types.ModuleType(qf_name)

        class Qformer:  # pragma: no cover - never instantiated
            def __init__(self, *a, **k):
                raise RuntimeError(
                    "reference Q-Former stubbed out (dormant on the active "
                    "path; targets an older transformers)")

        qf.Qformer = Qformer
        sys.modules[qf_name] = qf

    import llava.model.llava_arch as llava_arch
    import llava.model.language_model.llava_qwen as llava_qwen

    return llava_arch, llava_qwen


@dataclasses.dataclass(frozen=True)
class TinyGeometry:
    """Tiny-width spine geometry. Everything shape-structural (patch grid,
    pooled tokens, memory token counts, segment size, prompt ids) stays at
    the flagship values; only widths/depths shrink so the full reference
    torch model runs on CPU in test time."""

    lm_hidden: int = 64
    lm_layers: int = 2
    lm_heads: int = 4
    lm_kv_heads: int = 2
    lm_intermediate: int = 128
    # must exceed the hardcoded visual prompt ids (max 48876,
    # llava_arch.py:708-714) or embedding lookups go out of range
    vocab_size: int = 49152
    vision_hidden: int = 48
    vision_intermediate: int = 96
    # reference deletes the last encoder layer (siglip_encoder.py:571), so
    # 3 built layers run 2 — matching this repo's num_used_layers
    vision_layers: int = 3
    vision_heads: int = 4


def build_reference_model(geom: TinyGeometry = TinyGeometry(), *,
                          seed: int = 0, root: str = REFERENCE_ROOT):
    """Instantiate the reference ``LlavaQwenForCausalLM`` at tiny width with
    a real (tiny) SigLIP tower injected, fp32, eval mode.

    The tower goes through the reference's own ``SigLipVisionTower`` wrapper
    (delay_load=True to skip the hub fetch, then the exact ``load_model``
    surgery from siglip_encoder.py:569-575 applied to a locally constructed
    ``SigLipVisionModel``).
    """
    import torch
    from torch import nn

    _, llava_qwen = import_reference_llava(root)
    from llava.model.multimodal_encoder.siglip_encoder import (  # noqa: E501
        SigLipVisionConfig,
        SigLipVisionModel,
    )

    torch.manual_seed(seed)
    cfg = llava_qwen.LlavaQwenConfig(
        vocab_size=geom.vocab_size,
        hidden_size=geom.lm_hidden,
        intermediate_size=geom.lm_intermediate,
        num_hidden_layers=geom.lm_layers,
        num_attention_heads=geom.lm_heads,
        num_key_value_heads=geom.lm_kv_heads,
        max_position_embeddings=32768,
        rope_theta=1000000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        use_cache=True,
    )
    # the persisted multimodal flags of the active video recipe
    # (llava_arch.py:56-93 config dump / finetune_short.sh)
    cfg.mm_vision_tower = "google/siglip-so400m-patch14-384"
    cfg.mm_hidden_size = geom.vision_hidden
    cfg.mm_projector_type = "mlp2x_gelu"
    cfg.mm_resampler_type = None
    cfg.mm_patch_merge_type = "spatial_unpad"
    cfg.mm_spatial_pool_mode = "bilinear"
    cfg.mm_spatial_pool_stride = 2
    cfg.mm_newline_position = "one_token"
    cfg.mm_vision_select_layer = -2
    cfg.mm_vision_select_feature = "patch"
    cfg.image_aspect_ratio = "anyres_max_9"
    cfg.tokenizer_model_max_length = 32768
    cfg.tokenizer_padding_side = "right"
    cfg.dropout_frames = False
    cfg.delay_load = True  # tower built without weights; injected below

    model = llava_qwen.LlavaQwenForCausalLM(cfg)

    tower = model.get_model().vision_tower
    tiny_vision = SigLipVisionConfig(
        hidden_size=geom.vision_hidden,
        intermediate_size=geom.vision_intermediate,
        num_hidden_layers=geom.vision_layers,
        num_attention_heads=geom.vision_heads,
    )
    tower.config = tiny_vision
    tower.vision_tower = SigLipVisionModel(tiny_vision)
    # exact load_model surgery (siglip_encoder.py:569-575)
    del tower.vision_tower.vision_model.encoder.layers[-1:]
    tower.vision_tower.vision_model.head = nn.Identity()
    tower.vision_tower.requires_grad_(False)
    tower.is_loaded = True

    # image_newline is allocated with torch.empty (llava_arch.py:115) —
    # uninitialized memory; give it deterministic values
    with torch.no_grad():
        g = torch.Generator().manual_seed(seed + 1)
        model.get_model().image_newline.copy_(
            torch.randn(geom.lm_hidden, generator=g) / np.sqrt(geom.lm_hidden))

    model = model.float().eval()
    return model


def repo_config_for(geom: TinyGeometry = TinyGeometry()):
    """The repo VLMConfig matching ``build_reference_model``'s geometry."""
    from memory_augmented_vlm_tpu.config import (
        LMConfig,
        MemoryConfig,
        VisionConfig,
        VLMConfig,
    )

    return VLMConfig(
        lm=LMConfig(
            vocab_size=geom.vocab_size,
            hidden_size=geom.lm_hidden,
            intermediate_size=geom.lm_intermediate,
            num_hidden_layers=geom.lm_layers,
            num_attention_heads=geom.lm_heads,
            num_key_value_heads=geom.lm_kv_heads,
            head_dim=geom.lm_hidden // geom.lm_heads,
            tie_word_embeddings=False,
            dtype="float32",
        ),
        vision=VisionConfig(
            hidden_size=geom.vision_hidden,
            intermediate_size=geom.vision_intermediate,
            num_hidden_layers=geom.vision_layers,
            num_attention_heads=geom.vision_heads,
            dtype="float32",
        ),
        memory=MemoryConfig(hidden_size=geom.lm_hidden),
    )


def reference_state_to_params(model, cfg) -> dict:
    """Convert the live reference ``state_dict()`` into this repo's param
    pytree via the same ``checkpoint/hf_import`` converters the builder
    uses on real checkpoints."""
    import jax
    import jax.numpy as jnp

    from memory_augmented_vlm_tpu.checkpoint import hf_import
    from memory_augmented_vlm_tpu.models.position_encoding import (
        init_params as pe_init,
    )

    sd = hf_import.torch_state_dict_to_numpy(model.state_dict())
    params = {
        "vision_tower": hf_import.convert_siglip(sd, cfg.vision),
        "mm_projector": hf_import.convert_projector(
            sd, cfg.pipeline.mm_projector_type),
        "language_model": hf_import.convert_qwen2(sd, cfg.lm),
        "memory": hf_import.convert_memory_modules(sd, cfg.memory.depth),
        "positional_encoding": pe_init(
            cfg.memory.max_temporal_frames, cfg.lm.hidden_size,
            cfg.memory.learnable_pe, key=jax.random.key(0)),
    }
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)


def reference_spliced_embeds(model, video_chw, input_ids_np) -> np.ndarray:
    """Run the reference fusion spine
    (``prepare_inputs_labels_for_multimodal``, llava_arch.py:388-878) on one
    video and return the spliced ``inputs_embeds`` row as numpy (S, H)."""
    import torch

    input_ids = torch.asarray(np.asarray(input_ids_np), dtype=torch.long)[None]
    with torch.no_grad():
        (_, _, _, _, embeds, _) = (
            model.prepare_inputs_labels_for_multimodal(
                input_ids, None, None, None, None,
                images=[torch.asarray(video_chw)], modalities=["video"],
                image_sizes=None))
    return embeds[0].float().numpy()


def reference_greedy_tokens(model, video_chw, input_ids_np,
                            max_new_tokens: int = 8) -> np.ndarray:
    """Greedy tokens from the reference's own ``generate``
    (llava_qwen.py:116-136 -> HF GenerationMixin)."""
    import torch

    input_ids = torch.asarray(np.asarray(input_ids_np), dtype=torch.long)[None]
    with torch.no_grad():
        out = model.generate(
            inputs=input_ids, images=[torch.asarray(video_chw)],
            modalities=["video"], do_sample=False,
            max_new_tokens=max_new_tokens, pad_token_id=0,
            eos_token_id=None, use_cache=True)
    return np.asarray(out[0])
