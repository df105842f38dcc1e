"""Model / pipeline configuration dataclasses.

One typed config layer replaces the reference's ~60 argparse flags spread
across entry points (``generate_data.py:164-639``); the CLIs in
``distdiff_tpu.cli`` parse reference-compatible flags into these.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """UNet2DCondition architecture (SD-1.x geometry by default;
    SDXL-base geometry via :meth:`sdxl_base`)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # Per down-block: does it carry cross-attention transformers?
    cross_attention: Tuple[bool, ...] = (True, True, True, False)
    # int (uniform) or per-block tuple (SDXL uses (0, 2, 10)).
    transformer_depth: Any = 1
    # int (uniform) or per-block tuple (SDXL uses head_dim 64: (5, 10, 20)).
    num_attention_heads: Any = 8
    cross_attention_dim: int = 768
    time_embed_dim_mult: int = 4
    # SDXL additive conditioning: dim of the concatenated [pooled text
    # embeds | sinusoidal(time_ids)] vector fed through add_embedding
    # (2816 = 1280 + 6*256 for SDXL-base). None disables it.
    addition_embed_dim: Optional[int] = None
    # Weight-LAYOUT hint only (diffusers use_linear_projection): SD-2.x /
    # SDXL checkpoints store transformer proj_in/out as linear [C,C], SD-1.x
    # as 1x1 conv [C,C,1,1]. Our model always uses Dense; the converter and
    # synth-checkpoint enumerator consult this flag.
    linear_projection: bool = False
    # Rematerialize blocks in the backward pass (the role of the reference's
    # --gradient_checkpointing, generate_data.py:1049-1052): guidance
    # backprops through the UNet and would not fit HBM otherwise.
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * self.time_embed_dim_mult

    def depth_at(self, block: int) -> int:
        d = self.transformer_depth
        return d[block] if isinstance(d, (tuple, list)) else d

    def heads_at(self, block: int) -> int:
        h = self.num_attention_heads
        return h[block] if isinstance(h, (tuple, list)) else h

    @staticmethod
    def sd15() -> "UNetConfig":
        return UNetConfig()

    @staticmethod
    def sdxl_base() -> "UNetConfig":
        """SDXL-base: 3 blocks, no attention at the top level, transformer
        depths (0, 2, 10), head_dim 64, 2048-d context, additive pooled-
        text+size conditioning."""
        return UNetConfig(
            block_out_channels=(320, 640, 1280),
            cross_attention=(False, True, True),
            transformer_depth=(0, 2, 10),
            num_attention_heads=(5, 10, 20),
            cross_attention_dim=2048,
            addition_embed_dim=2816,
        )

    @staticmethod
    def sd21() -> "UNetConfig":
        """SD-2.1: SD-1.x topology with head_dim 64 everywhere (per-block
        heads 5/10/20/20) and the 1024-d OpenCLIP-H text context
        (diffusers stabilityai/stable-diffusion-2-1 unet config;
        865,910,724 params — pinned in weights/sd15_geometry.py). The
        reference is SD-1.x-only (generate_data.py:166-172); this is
        beyond-reference surface. diffusers' use_linear_projection is a
        weight-layout detail only: our transformers already express 1x1
        projections as Dense."""
        return UNetConfig(
            num_attention_heads=(5, 10, 20, 20),
            cross_attention_dim=1024,
            linear_projection=True,
        )

    @staticmethod
    def tiny() -> "UNetConfig":
        """CPU-runnable toy geometry for tests (BASELINE config 1)."""
        return UNetConfig(
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention=(True, False),
            num_attention_heads=2,
            cross_attention_dim=32,
            dtype=jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL architecture (SD-1.x geometry by default)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    # Remat decoder blocks: the guidance gradient flows through the 512^2
    # decode, whose saved activations dominate HBM otherwise.
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def sd15() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def sdxl() -> "VAEConfig":
        """SDXL's retrained VAE: same architecture as SD-1.x but a different
        latent scale (0.13025, per stabilityai/stable-diffusion-xl-base's
        published vae config) — using 0.18215 would mis-scale latents ~1.4x
        before decode."""
        return VAEConfig(scaling_factor=0.13025)

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(
            block_out_channels=(16, 32),
            layers_per_block=1,
            dtype=jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    """CLIP text transformer (SD-1.x uses CLIP ViT-L/14's text tower)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    max_length: int = 77
    # CLIP uses quick_gelu; newer OpenCLIP text towers use gelu.
    activation: str = "quick_gelu"
    # When set, the encoder also exposes a pooled+projected embedding of
    # this dimension (the CLIP contrastive space used by zero-shot heads);
    # SD's conditioning path uses only the last hidden state.
    embed_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16

    @staticmethod
    def sd15() -> "TextEncoderConfig":
        return TextEncoderConfig()

    @staticmethod
    def sd21() -> "TextEncoderConfig":
        """SD-2's text encoder: the OpenCLIP ViT-H/14 text tower truncated
        to 23 layers (diffusers ships the truncation; the conditioning is
        its final-layer-norm output), width 1024, plain gelu
        (340,387,840 params — pinned in weights/sd15_geometry.py)."""
        return TextEncoderConfig(
            hidden_size=1024, num_layers=23, num_heads=16,
            activation="gelu",
        )

    @staticmethod
    def sdxl_big() -> "TextEncoderConfig":
        """SDXL's text_encoder_2: OpenCLIP-bigG text tower (width 1280,
        32 layers, plain gelu, projected pooled output)."""
        return TextEncoderConfig(
            hidden_size=1280, num_layers=32, num_heads=20,
            activation="gelu", embed_dim=1280,
        )

    @staticmethod
    def tiny() -> "TextEncoderConfig":
        return TextEncoderConfig(
            vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
            max_length=16, dtype=jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Everything needed to assemble the expansion pipeline."""

    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig.sd15)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig.sd15)
    text_encoder: TextEncoderConfig = dataclasses.field(
        default_factory=TextEncoderConfig.sd15
    )
    # SDXL's second text encoder (OpenCLIP-bigG); None for SD-1.x.
    text_encoder_2: Optional[TextEncoderConfig] = None
    sample_size: int = 512  # pixel resolution
    num_inference_steps: int = 50
    # DDIM parameterization of the UNet output: "epsilon" (SD-1.x, SDXL)
    # or "v_prediction" (SD-2.1 768-v) — schedulers/ddim.py:117-124.
    prediction_type: str = "epsilon"
    # Sampling solver: "ddim" (the reference's DDIMScheduler,
    # generate_data.py:863-864) or "dpmpp" (DPM-Solver++(2M),
    # beyond-reference — schedulers/dpm.py).
    scheduler: str = "ddim"
    # DeepCache-style deep-feature caching (sampling/deepcache.py):
    # opt-in approximate acceleration, never the parity default. A full
    # UNet step every cache_interval steps; shallow cached steps (down
    # levels <= cache_branch refreshed) in between. DDIM-only.
    deep_cache: bool = False
    cache_interval: int = 3
    cache_branch: int = 0
    # int8 w8a8 UNet denoise spans (ops/quant.py): opt-in approximate
    # acceleration for the v5e's 2x int8 MXU peak, never the parity
    # default. Guidance steps and the VAE stay exact bf16.
    int8: bool = False

    @property
    def vae_scale_factor(self) -> int:
        # one spatial halving per non-final VAE block (8 for SD's 4 blocks)
        return 2 ** (len(self.vae.block_out_channels) - 1)

    @property
    def latent_size(self) -> int:
        return self.sample_size // self.vae_scale_factor

    @staticmethod
    def sd15() -> "PipelineConfig":
        return PipelineConfig()

    @staticmethod
    def sdxl_base(sample_size: int = 1024) -> "PipelineConfig":
        """SDXL-base: 3-block UNet (depths 0/2/10, 2048-d context, additive
        pooled+size conditioning), SDXL VAE (SD geometry, 0.13025 scale),
        dual text encoders."""
        return PipelineConfig(
            unet=UNetConfig.sdxl_base(),
            vae=VAEConfig.sdxl(),
            text_encoder=TextEncoderConfig.sd15(),
            text_encoder_2=TextEncoderConfig.sdxl_big(),
            sample_size=sample_size,
        )

    @staticmethod
    def sd21(sample_size: int = 768,
             prediction_type: str = "v_prediction") -> "PipelineConfig":
        """SD-2.1 (768-v by default: v-prediction DDIM). Pass
        ``sample_size=512, prediction_type="epsilon"`` for the 512-base
        variant. Same VAE geometry/scale as SD-1.x."""
        return PipelineConfig(
            unet=UNetConfig.sd21(),
            vae=VAEConfig.sd15(),
            text_encoder=TextEncoderConfig.sd21(),
            sample_size=sample_size,
            prediction_type=prediction_type,
        )

    @staticmethod
    def sdxl_tiny(sample_size: int = 32) -> "PipelineConfig":
        """CPU-runnable SDXL-shaped toy: per-block depths, dual encoders,
        additive conditioning — every SDXL code path at test scale."""
        return PipelineConfig(
            unet=UNetConfig(
                block_out_channels=(16, 32, 64),
                layers_per_block=1,
                cross_attention=(False, True, True),
                transformer_depth=(0, 1, 2),
                num_attention_heads=(2, 2, 4),
                cross_attention_dim=48,
                addition_embed_dim=16 + 6 * 8,
                dtype=jnp.float32,
                remat=False,
            ),
            vae=VAEConfig.tiny(),
            text_encoder=TextEncoderConfig(
                vocab_size=1000, hidden_size=16, num_layers=2, num_heads=2,
                max_length=16, dtype=jnp.float32,
            ),
            text_encoder_2=TextEncoderConfig(
                vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
                max_length=16, embed_dim=16, activation="gelu",
                dtype=jnp.float32,
            ),
            sample_size=sample_size,
            num_inference_steps=10,
        )

    @staticmethod
    def tiny(sample_size: int = 32) -> "PipelineConfig":
        return PipelineConfig(
            unet=UNetConfig.tiny(),
            vae=VAEConfig.tiny(),
            text_encoder=TextEncoderConfig.tiny(),
            sample_size=sample_size,
            num_inference_steps=10,
        )


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """DistDiff guidance hyperparameters (reference defaults from
    ``scripts/exps/expand_diff.sh:3-24`` and ``generate_data.py`` flags)."""

    guidance_type: str = "transform_guidance"  # or "direct_guidance", "none"
    guidance_step: int = 20        # counted from the END of the step plan
    guidance_period: int = 2
    rho: float = 10.0              # guidance SGD learning rate
    constraint_value: float = 0.2  # l-inf ball radius around the latents
    gs: float = 1.0                # global-prototype energy weight
    ls: float = 1.0                # local-prototype energy weight
    K: int = 3                     # local prototypes per class
    optimize_targets: Sequence[str] = ("global_prototype", "local_prototype")
    # The reference L2-normalizes features in direct_guidance but NOT in
    # transform_guidance (generate_data.py:705 vs :747) — kept as a flag.
    normalize_features: Optional[bool] = None
    # Beyond-reference --guidance_step_in_plan: when the window (counted
    # from the end of the FULL plan, generate_data.py:1178-1180) falls
    # before the img2img start index, SHIFT it to the first executed step
    # instead of the reference's silent unguided clamp. Default False =
    # exact reference parity.
    step_in_plan: bool = False
    # Guide-encoder input resolution (224 bicubic in the reference,
    # generate_data.py:704; smaller for CPU-runnable test configs).
    guide_input_size: int = 224
    # Rollout rematerialisation for the guidance backward:
    #   "step"   — jax.checkpoint around each rollout step ON TOP of the
    #              models' inner nn.remat (lowest HBM; backward recomputes
    #              each forward twice: once for the step, once per block)
    #   "decode" — checkpoint ONLY the VAE-decode+guide-encode leg (its
    #              residual is the tiny pred-x0 latents); UNet steps rely
    #              on inner nn.remat alone — saves one UNet forward
    #              recompute per rollout step vs "step"
    #   "block"  — inner nn.remat only (OOMs at batch 8 AND 4 on v5e-1:
    #              BOTH rollout steps' 512^2 VAE decoder block activations
    #              are live at once and don't fit)
    #   "step_nru" — like "step" but the rollout's UNet instance has inner
    #              remat DISABLED: the outer checkpoint's recompute saves
    #              block activations for the backward instead of
    #              re-forwarding each block (one step's saves live at a
    #              time; modest at latent resolution)
    #   "step_nr"  — "step_nru" plus no inner remat in the VAE decoder
    #              (needs one step's 512^2 decoder activations in HBM).
    #              Both *_nr(u) OOM at SD-1.5 bench batch 8 on v5e-1.
    #   "tail"   — like "step" but the LAST rollout step is NOT outer-
    #              checkpointed: its backward runs first, so only its
    #              block-boundary residuals stay live, and the backward
    #              skips one full step re-forward
    #   "decode_nr" — outer per-step checkpoint + UNet inner remat, but
    #              the rollout's VAE decoder instance has inner remat
    #              DISABLED (the outer recompute's decoder activations are
    #              reused instead of re-forwarding every decoder block)
    #   "tail_decode_nr" — "tail" + "decode_nr" combined
    rollout_remat: str = "step"

    def wants_global(self) -> bool:
        return "global_prototype" in self.optimize_targets

    def wants_local(self) -> bool:
        return "local_prototype" in self.optimize_targets
