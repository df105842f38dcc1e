"""SDXL-base pipeline: dual text encoders + additive conditioning.

The reference repo is SD-1.x only; SDXL is framework surface the rebuild
carries forward (BASELINE config 5 groundwork): the SDXL UNet geometry
(per-block transformer depth, 2048-d context) already lives in
``UNetConfig.sdxl_base`` — this module supplies the rest of the recipe:

  * prompt conditioning: CLIP-L penultimate hidden state (768) ⊕
    OpenCLIP-bigG penultimate hidden state (1280) -> 2048-d context;
    bigG's projected pooled embedding feeds the additive conditioning
  * added_cond = [pooled | sinusoidal(time_ids)]: time_ids =
    (orig_h, orig_w, crop_top, crop_left, target_h, target_w), 256-d
    fourier each (2816 = 1280 + 6*256 for SDXL-base)
  * CFG denoising over the DDIM plan and VAE decode, one jittable program

Weight path: ``weights.convert.convert_sdxl_checkpoint`` maps the diffusers
SDXL layout (geometry pinned to the published 2,567,463,684 / 694,659,840
param totals in ``weights/sd15_geometry.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from distdiff_tpu.config import PipelineConfig
from distdiff_tpu.models import AutoencoderKL, CLIPTextEncoder, UNet2DCondition
from distdiff_tpu.models.layers import timestep_embedding
from distdiff_tpu.sampling.sampler import SamplerConfig, denoise_range, img2img_init
from distdiff_tpu.schedulers import DDIMSchedule, build_schedule


def time_ids_embedding(time_ids: jnp.ndarray, dim_per_id: int = 256) -> jnp.ndarray:
    """[B, 6] micro-conditioning ids -> [B, 6*dim_per_id] sinusoidal embeds
    (diffusers ``add_time_proj``; same [cos|sin] convention as timesteps)."""
    b, k = time_ids.shape
    flat = timestep_embedding(time_ids.reshape(-1), dim_per_id)
    return flat.reshape(b, k * dim_per_id)


def default_time_ids(batch: int, size: int) -> jnp.ndarray:
    """(orig, crop 0,0, target) for square generation at ``size``."""
    row = jnp.asarray([size, size, 0, 0, size, size], jnp.float32)
    return jnp.broadcast_to(row[None], (batch, 6))


@dataclasses.dataclass
class SDXLPipeline:
    """SDXL text-to-image / img2img with the additive-conditioning UNet."""

    config: PipelineConfig
    sampler_cfg: SamplerConfig
    sched: DDIMSchedule
    unet: UNet2DCondition
    vae: AutoencoderKL
    text_encoder: CLIPTextEncoder     # CLIP-L
    text_encoder_2: CLIPTextEncoder   # OpenCLIP-bigG (projected)
    params: Dict[str, Any]            # {'unet','vae','text','text_2'}
    strength: float = 0.5
    offset_noise: bool = False

    @staticmethod
    def create(
        config: Optional[PipelineConfig] = None,
        sampler_cfg: SamplerConfig = SamplerConfig(),
        params: Optional[Dict[str, Any]] = None,
        strength: float = 0.5,
        offset_noise: bool = False,
        seed: int = 0,
        lazy_params: bool = False,
    ) -> "SDXLPipeline":
        config = config or PipelineConfig.sdxl_base()
        assert config.text_encoder_2 is not None, "SDXL needs text_encoder_2"
        unet = UNet2DCondition(config.unet)
        vae = AutoencoderKL(config.vae)
        te1 = CLIPTextEncoder(config.text_encoder)
        te2 = CLIPTextEncoder(config.text_encoder_2)
        if params is None:
            params = init_sdxl_params(config, unet, vae, te1, te2,
                                      seed=seed, lazy=lazy_params)
        return SDXLPipeline(
            config=config, sampler_cfg=sampler_cfg,
            sched=build_schedule(config.scheduler, config.num_inference_steps),
            unet=unet, vae=vae, text_encoder=te1, text_encoder_2=te2,
            params=params, strength=strength, offset_noise=offset_noise,
        )

    # ------------------------------------------------------- conditioning
    def encode_prompt(
        self, params, ids_1: jnp.ndarray, ids_2: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(context [B, T, 768+1280], pooled [B, 1280]) from the two
        tokenizations of the same prompt."""
        h1 = self.text_encoder.apply(
            {"params": params["text"]}, ids_1,
            method=self.text_encoder.penultimate_hidden,
        )
        h2, pooled = self.text_encoder_2.apply(
            {"params": params["text_2"]}, ids_2,
            method=self.text_encoder_2.sdxl_outputs,
        )
        return jnp.concatenate([h1, h2], axis=-1), pooled

    def added_cond(self, pooled: jnp.ndarray,
                   time_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if time_ids is None:
            time_ids = default_time_ids(pooled.shape[0],
                                        self.config.sample_size)
        dim = (self.config.unet.addition_embed_dim - pooled.shape[-1]) // 6
        return jnp.concatenate(
            [pooled, time_ids_embedding(time_ids, dim)], axis=-1,
        )

    # ----------------------------------------------------------- sampling
    def make_sample_fn(self, text_to_img: bool = True) -> Callable:
        """sample(params, latents_or_shape_donor, cond_ctx, cond_add,
        uncond_ctx, uncond_add, key) -> images [B,H,W,3] in [0,1]."""
        sched = self.sched
        cfg = self.sampler_cfg
        start = 0 if text_to_img else _start_index(sched, self.strength)
        n = sched.num_inference_steps

        def eps_fn(params, x, t, ctx2, add2):
            import contextlib

            if getattr(self.config, "int8", False):  # w8a8 spans (ops/quant)
                from distdiff_tpu.ops import quant

                qctx = quant.int8_inference
            else:
                qctx = contextlib.nullcontext
            with qctx():
                out = self.unet.apply(
                    {"params": params["unet"]},
                    jnp.concatenate([x, x], axis=0), t, ctx2, add2,
                )
            eps_u, eps_t = jnp.split(out, 2, axis=0)
            return eps_u + cfg.guidance_scale * (eps_t - eps_u)

        def sample(params, latents, cond_ctx, cond_add, uncond_ctx,
                   uncond_add, key):
            if text_to_img:
                x = jax.random.normal(key, latents.shape, jnp.float32)
            else:
                x, _ = img2img_init(sched, latents, key, self.strength,
                                    offset_noise=self.offset_noise)
            ctx2 = jnp.concatenate([uncond_ctx, cond_ctx], axis=0)
            add2 = jnp.concatenate([uncond_add, cond_add], axis=0)

            # adapt to the 5-arg eps contract so denoise_range dispatches
            # the solver (DDIM or DPM-Solver++) exactly as the SD-1.x path
            def eps5(p, xx, t, cond, _uncond):
                return eps_fn(p, xx, t, *cond)

            x = denoise_range(sched, eps5, params, x, (ctx2, add2), None,
                              start, n)
            z = x.astype(jnp.float32) / self.config.vae.scaling_factor
            img = self.vae.apply({"params": params["vae"]}, z,
                                 method=self.vae.decode)
            return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

        return sample


def _start_index(sched: DDIMSchedule, strength: float) -> int:
    from distdiff_tpu.schedulers import img2img_start_index

    return img2img_start_index(sched, strength)


def init_sdxl_params(config, unet, vae, te1, te2, seed=0, lazy=False):
    ls = config.latent_size
    lat = jnp.zeros((1, ls, ls, config.unet.in_channels), jnp.float32)
    ctx = jnp.zeros((1, 8, config.unet.cross_attention_dim), jnp.float32)
    add = jnp.zeros((1, config.unet.addition_embed_dim), jnp.float32)
    img = jnp.zeros((1, config.sample_size, config.sample_size, 3), jnp.float32)
    ids1 = jnp.zeros((1, config.text_encoder.max_length), jnp.int32)
    ids2 = jnp.zeros((1, config.text_encoder_2.max_length), jnp.int32)
    key = jax.random.PRNGKey(seed)
    if lazy:
        # bf16 fill: materializing 2.57B fp32 leaves (10.3GB) OOMs a v5e-1
        # before a bench can even cast; values are irrelevant here
        def fill(shapes):
            return jax.tree.map(
                lambda s: jnp.full(
                    s.shape, 0.02,
                    jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
                shapes)

        return {
            "unet": fill(jax.eval_shape(
                unet.init, key, lat, jnp.array([1]), ctx, add)["params"]),
            "vae": fill(jax.eval_shape(vae.init, key, img)["params"]),
            "text": fill(jax.eval_shape(te1.init, key, ids1)["params"]),
            "text_2": fill(jax.eval_shape(te2.init, key, ids2)["params"]),
        }
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "unet": jax.jit(unet.init)(k1, lat, jnp.array([1]), ctx, add)["params"],
        "vae": jax.jit(vae.init)(k2, img)["params"],
        "text": jax.jit(te1.init)(k3, ids1)["params"],
        "text_2": jax.jit(te2.init)(k4, ids2)["params"],
    }
