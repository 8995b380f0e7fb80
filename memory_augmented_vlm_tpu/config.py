"""Typed configuration for the whole framework.

The reference scatters its behavior flags across HF dataclass CLI args,
checkpoint `config.json` fields, `overwrite_config` dicts and hard-coded
constants (SURVEY.md §5).  Here everything lives in frozen dataclasses so it
can be closed over by `jax.jit` traces (configs are static).

Reference anchors:
  - LM config fields            : HF Qwen2 config (llava/model/language_model/llava_qwen.py)
  - Vision config               : llava/model/multimodal_encoder/siglip_encoder.py:70-99
  - Memory config               : llava/model/memory_module/MemoryController.py:7-18
                                  overridden at llava/model/llava_arch.py:118-129
  - Pipeline flags              : llava/train/train.py:70-192, scripts/train/finetune_short.sh
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union


@dataclasses.dataclass(frozen=True)
class LMConfig:
    """Qwen2-family decoder config (matches HF `Qwen2Config` semantics)."""

    vocab_size: int = 151936
    hidden_size: int = 896
    intermediate_size: int = 4864
    num_hidden_layers: int = 24
    num_attention_heads: int = 14
    num_key_value_heads: int = 2
    head_dim: int = 64
    max_position_embeddings: int = 32768
    rope_theta: float = 1000000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    attention_bias: bool = True       # Qwen2 uses bias on q/k/v, none on o
    # rope scaling (train.py:113-114,1362-1372 overwrite_config rope knobs)
    rope_scaling_type: Optional[str] = None   # None | "linear" | "dynamic"
    rope_scaling_factor: float = 1.0
    # family variations (Gemma): gelu-tanh MLP, (1+w) RMSNorm, sqrt(H) embeds
    mlp_act: str = "silu"
    norm_plus_one: bool = False
    scale_embeddings: bool = False
    # family variations (MPT, llava/model/language_model/llava_mpt.py):
    # ALiBi position bias instead of RoPE, bias-free LayerNorm instead of
    # RMSNorm, ungated up->act->down MLP instead of SwiGLU
    position_embedding: str = "rope"   # "rope" | "alibi"
    norm_type: str = "rmsnorm"         # "rmsnorm" | "layernorm"
    mlp_gated: bool = True
    alibi_bias_max: int = 8
    # sparse MoE MLP (Mixtral, llava/model/language_model/llava_mixtral.py):
    # 0 experts = dense MLP; top-k routing with renormalized softmax weights
    num_local_experts: int = 0
    num_experts_per_tok: int = 2
    # Qwen2MoE variations (llava/model/language_model/llava_qwen_moe.py):
    # routing weights are NOT renormalized over the top-k by default
    # (HF norm_topk_prob=False), and a gated shared expert of its own
    # intermediate size runs alongside the routed experts
    moe_norm_topk_prob: bool = True
    moe_shared_expert_size: int = 0   # 0 = no shared expert (Mixtral)
    # pipeline-parallel schedule knob (ops/pipeline.py): microbatch count for
    # the GPipe layer scan under a pp>1 mesh. 0 = one per stage; raising it
    # shrinks the fill/drain bubble (P-1)/(M+P-1) at the cost of smaller
    # per-microbatch matmuls. Local batch must divide it (pp_viable).
    pp_microbatches: int = 0
    # dtype used for activations on device (params may be kept in fp32 master copies)
    dtype: str = "bfloat16"

    @property
    def kv_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @staticmethod
    def qwen2_0_5b() -> "LMConfig":
        return LMConfig()

    @staticmethod
    def qwen2_7b() -> "LMConfig":
        return LMConfig(
            hidden_size=3584,
            intermediate_size=18944,
            num_hidden_layers=28,
            num_attention_heads=28,
            num_key_value_heads=4,
            head_dim=128,
            tie_word_embeddings=False,
        )

    @staticmethod
    def from_hf(cfg) -> "LMConfig":
        """Build from a HF `Qwen2Config`-like object."""
        n_heads = cfg.num_attention_heads
        return LMConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=n_heads,
            num_key_value_heads=getattr(cfg, "num_key_value_heads", n_heads),
            head_dim=getattr(cfg, "head_dim", None) or cfg.hidden_size // n_heads,
            max_position_embeddings=cfg.max_position_embeddings,
            rope_theta=getattr(cfg, "rope_theta", 1000000.0),
            rms_norm_eps=getattr(cfg, "rms_norm_eps", 1e-6),
            tie_word_embeddings=getattr(cfg, "tie_word_embeddings", False),
        )


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """SigLIP-SO400M vision tower config (siglip_encoder.py:70-99).

    `num_used_layers` reflects the reference tower deleting its final encoder
    layer so the output equals hidden_states[-2] (siglip_encoder.py:571-572).
    """

    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_pytorch_tanh"
    num_channels: int = 3
    dtype: str = "bfloat16"

    @property
    def num_used_layers(self) -> int:
        return self.num_hidden_layers - 1  # last layer dropped (select layer -2)

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size  # 27

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side**2  # 729


@dataclasses.dataclass(frozen=True)
class MemoryConfig:
    """Recurrent-memory transformer config.

    Defaults match the active overrides at llava_arch.py:118-129 (hidden size
    is filled in from the LM at assembly time).
    """

    hidden_size: int = 896            # = LM hidden size
    num_attention_heads: int = 8
    patch_size: int = 196             # visual tokens per frame after 2x2 pool
    layer_norm_eps: float = 1e-12
    intermediate_mult: int = 4
    hidden_act: str = "relu"
    num_memory_tokens: int = 8
    depth: int = 2
    cache_cap: int = 10               # MemoryController.py:153
    segment_frames: int = 32          # llava_arch.py:528
    num_fine_frames: int = 32         # llava_arch.py:514
    max_temporal_frames: int = 600    # llava_arch.py:146
    learnable_pe: bool = False        # sinusoidal (llava_arch.py:148)

    @property
    def intermediate_size(self) -> int:
        return self.intermediate_mult * self.hidden_size


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Multimodal assembly flags (persisted `model.config.*` in the reference).

    Defaults are the *active* video recipe (scripts/train/finetune_short.sh).
    """

    mm_vision_tower: str = "google/siglip-so400m-patch14-384"
    s2: bool = False                  # CLIP-S2 multi-scale wrapper
    mm_projector_type: str = "mlp2x_gelu"
    mm_resampler_type: Optional[str] = None
    mm_patch_merge_type: str = "spatial_unpad"
    mm_newline_position: str = "one_token"
    mm_spatial_pool_mode: str = "bilinear"
    mm_spatial_pool_stride: int = 2
    image_aspect_ratio: str = "anyres_max_9"
    # anyres tiling grid (`image_grid_pinpoints` in the reference config,
    # llava_arch.py:653): a spec string or a tuple of (w, h) resolutions
    # (tuple, not list — PipelineConfig must stay hashable for jit statics)
    image_grid_pinpoints: Union[str, Tuple[Tuple[int, int], ...]] = "(1x1),...,(6x6)"
    mm_vision_select_layer: int = -2
    mm_vision_select_feature: str = "patch"
    dropout_frames: bool = False
    add_time_instruction: bool = False
    use_pos_skipping: bool = False
    pos_skipping_range: int = 4096
    tokenizer_model_max_length: int = 32768
    tokenizer_padding_side: str = "right"
    frames_upbound: int = 300
    video_fps: int = 1
    force_sample: bool = False
    # density-adaptive sampling ladder instead of the n*32 rule
    # (dynamic_process_video_with_decord, llava/utils.py:55-89)
    dynamic_video_sampling: bool = False
    # int8 quantized inference for the frozen tower (load_8bit equivalent)
    tower_int8: bool = False
    # Frame-count buckets used to keep shapes static under jit.
    frame_buckets: Tuple[int, ...] = (32, 64, 96, 128, 160, 192, 224, 256)


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    """Full model: tower + projector + memory + LM + pipeline flags."""

    lm: LMConfig = dataclasses.field(default_factory=LMConfig)
    vision: VisionConfig = dataclasses.field(default_factory=VisionConfig)
    memory: MemoryConfig = dataclasses.field(default_factory=MemoryConfig)
    pipeline: PipelineConfig = dataclasses.field(default_factory=PipelineConfig)

    def __post_init__(self):
        if self.memory.hidden_size != self.lm.hidden_size:
            object.__setattr__(
                self, "memory",
                dataclasses.replace(self.memory, hidden_size=self.lm.hidden_size),
            )
        # memory.patch_size is structurally determined by the tower geometry
        # (tokens per frame after the 2x2 pool) — derive it so alternative
        # towers (CLIP 24x24 -> 144, imagebind 1) stay consistent.
        from memory_augmented_vlm_tpu.models import encoders as _encoders

        side = _encoders.tower_for(self).num_patches_per_side
        stride = self.pipeline.mm_spatial_pool_stride
        pooled = (-(-side // stride)) ** 2 if side > 1 else 1
        if self.memory.patch_size != pooled:
            object.__setattr__(
                self, "memory",
                dataclasses.replace(self.memory, patch_size=pooled),
            )

    @staticmethod
    def onevision_0_5b() -> "VLMConfig":
        return VLMConfig(lm=LMConfig.qwen2_0_5b())

    @staticmethod
    def onevision_7b() -> "VLMConfig":
        return VLMConfig(lm=LMConfig.qwen2_7b())


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding (replaces torchrun+NCCL+ZeRO).

    Axes: `data` for per-host batch sharding (DCN-friendly), `fsdp` for
    parameter/optimizer sharding (ICI), `tp` for tensor parallel on 7B+,
    `sp` for sequence/context parallelism (ring attention over the ~19k-token
    128-frame prefill; ops/ring_attention.py), `pp` for pipeline parallelism
    (GPipe layer stages; ops/pipeline.py), `ep` for expert parallelism (the
    MoE expert axis shards over (fsdp, ep); each device computes its local
    experts for all tokens and the zero-masked weighted sum psums).
    """

    data: int = 1
    fsdp: int = 1
    tp: int = 1
    sp: int = 1
    pp: int = 1
    ep: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.fsdp * self.tp * self.sp * self.pp * self.ep
