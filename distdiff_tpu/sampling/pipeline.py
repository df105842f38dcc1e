"""End-to-end guided expansion pipeline assembly.

Glues scheduler + UNet + VAE + guide encoder + guidance into ONE jitted
program per (batch shape): noise cached latents, denoise with CFG, splice
DistDiff guidance at the statically-known window, decode to images. This is
the XLA re-design of the reference's eager hot loop
(``generate_data.py:1130-1245``): where the reference pays per-step Python
dispatch + separate autograd graphs, here the full trajectory (guidance
backprop included) is a single compiled computation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from distdiff_tpu.config import GuidanceConfig, PipelineConfig
from distdiff_tpu.guidance.optimize import (
    GuidanceContext,
    direct_guidance,
    transform_guidance,
)
from distdiff_tpu.models import AutoencoderKL, CLIPTextEncoder, UNet2DCondition
from distdiff_tpu.models.guide.factory import GuideModel
from distdiff_tpu.sampling.sampler import (
    SamplerConfig,
    denoise_range,
    img2img_init,
    make_eps_fn,
)
from distdiff_tpu.schedulers import (
    DDIMSchedule,
    DPMSchedule,
    build_schedule,
    ddim_step,
    denoise_range_dpm,
    guidance_window,
    img2img_start_index,
    make_schedule,
)

GUIDE_INPUT_SIZE = 224


def _clamp_window(guidance_type: str, start: int, g0: int, g1: int,
                  step_in_plan: bool = False, n: Optional[int] = None):
    """Clamp the guidance window to the img2img start index.

    The reference's hot loop only visits step indices >= start_index, so a
    window that begins before it never triggers (transform guidance's single
    trigger at g0 is skipped entirely; direct guidance runs only the
    surviving [max(g0, start), g1) steps) — ``generate_data.py:1190-1215``.
    With e.g. ``--strength 0.3`` and the default guidance_step 20, start=35
    exceeds g0=30 and the reference simply produces an unguided sample.

    ``step_in_plan`` (beyond-reference, --guidance_step_in_plan): instead
    of silently dropping the window, SHIFT it to the first executed step —
    short solver plans (dpmpp --steps 20) stay guided. Default keeps the
    reference's clamp for parity. Returns (guided, g0, g1).
    """
    period = g1 - g0
    if step_in_plan and g0 < start:
        g0 = start if n is None else min(start, n - period)
        return True, g0, g0 + period
    if guidance_type == "transform_guidance":
        if g0 < start:
            return False, g0, g1
        return True, g0, g1
    g0 = max(g0, start)
    return g0 < g1, g0, g1


@dataclasses.dataclass
class ExpansionPipeline:
    """Bundle of modules + params with compiled entry points."""

    config: PipelineConfig
    sampler_cfg: SamplerConfig
    guidance_cfg: GuidanceConfig
    sched: DDIMSchedule
    unet: UNet2DCondition
    vae: AutoencoderKL
    text_encoder: CLIPTextEncoder
    params: Dict[str, Any]           # {'unet', 'vae', 'text'[, 'text_2']}
    # SDXL's second (OpenCLIP-bigG) text tower; None for SD-1.x. When set,
    # conditioning is the {"ctx", "add"} pytree (sampling.conditioning).
    text_encoder_2: Optional[CLIPTextEncoder] = None
    guide: Optional[GuideModel] = None
    global_protos: Optional[jnp.ndarray] = None
    local_protos: Optional[jnp.ndarray] = None
    strength: float = 0.5
    offset_noise: bool = False

    # ---- construction ----
    @staticmethod
    def create(
        config: PipelineConfig,
        sampler_cfg: SamplerConfig = SamplerConfig(),
        guidance_cfg: GuidanceConfig = GuidanceConfig(),
        params: Optional[Dict[str, Any]] = None,
        guide: Optional[GuideModel] = None,
        global_protos=None,
        local_protos=None,
        strength: float = 0.5,
        offset_noise: bool = False,
        seed: int = 0,
        lazy_params: bool = False,
    ) -> "ExpansionPipeline":
        sched = build_schedule(
            config.scheduler,
            config.num_inference_steps,
            prediction_type=config.prediction_type,
        )
        unet = UNet2DCondition(config.unet)
        vae = AutoencoderKL(config.vae)
        text_encoder = CLIPTextEncoder(config.text_encoder)
        text_encoder_2 = (CLIPTextEncoder(config.text_encoder_2)
                          if config.text_encoder_2 is not None else None)
        if params is None:
            if lazy_params:
                params = init_params_lazy(config, unet, vae, text_encoder,
                                          text_encoder_2=text_encoder_2)
            else:
                params = init_params(config, unet, vae, text_encoder, seed,
                                     text_encoder_2=text_encoder_2)
        return ExpansionPipeline(
            config=config,
            sampler_cfg=sampler_cfg,
            guidance_cfg=guidance_cfg,
            sched=sched,
            unet=unet,
            vae=vae,
            text_encoder=text_encoder,
            text_encoder_2=text_encoder_2,
            params=params,
            guide=guide,
            global_protos=(
                jnp.asarray(global_protos) if global_protos is not None else None
            ),
            local_protos=(
                jnp.asarray(local_protos) if local_protos is not None else None
            ),
            strength=strength,
            offset_noise=offset_noise,
        )

    # ---- raw building blocks (pure functions of explicit params) ----
    @property
    def is_sdxl(self) -> bool:
        return self.config.unet.addition_embed_dim is not None

    def unet_apply(self, params, x, t, ctx):
        if isinstance(ctx, dict):  # SDXL: context + additive conditioning
            return self.unet.apply(
                {"params": params["unet"]}, x, t, ctx["ctx"], ctx["add"]
            )
        return self.unet.apply({"params": params["unet"]}, x, t, ctx)

    def eps_fn(self, exact: bool = False) -> Callable:
        """CFG epsilon closure. With ``config.int8`` the UNet's convs and
        ff denses run the w8a8 path (ops/quant.py) — approximate, so the
        guidance leg requests ``exact=True`` and keeps bf16 (as DeepCache
        keeps its guidance steps exact)."""
        unet_apply = self.unet_apply
        if getattr(self.config, "int8", False) and not exact:
            from distdiff_tpu.ops import quant

            def apply_q(p, x, t, ctx):
                with quant.int8_inference():
                    return unet_apply(p, x, t, ctx)

            return make_eps_fn(apply_q, self.sampler_cfg)
        return make_eps_fn(
            lambda p, x, t, ctx: unet_apply(p, x, t, ctx), self.sampler_cfg
        )

    def cached_eps_fns(self):
        """(eps_full, eps_shallow) for the DeepCache loop
        (sampling/deepcache.py; config.deep_cache). The guidance rollout
        never uses these — its gradient flows through the full denoiser."""
        import contextlib

        from distdiff_tpu.sampling.deepcache import make_cached_eps_fns

        branch = self.config.cache_branch
        if getattr(self.config, "int8", False):  # int8 + deep_cache compose
            from distdiff_tpu.ops import quant

            _qctx = quant.int8_inference
        else:
            _qctx = contextlib.nullcontext

        def apply_full(params, x, t, ctx):
            with _qctx():
                if isinstance(ctx, dict):
                    return self.unet.apply(
                        {"params": params["unet"]}, x, t, ctx["ctx"],
                        ctx["add"], return_cache=True, cache_branch=branch)
                return self.unet.apply(
                    {"params": params["unet"]}, x, t, ctx,
                    return_cache=True, cache_branch=branch)

        def apply_shallow(params, x, t, ctx, cache):
            with _qctx():
                if isinstance(ctx, dict):
                    return self.unet.apply(
                        {"params": params["unet"]}, x, t, ctx["ctx"],
                        ctx["add"], deep_cache=cache, cache_branch=branch)
                return self.unet.apply(
                    {"params": params["unet"]}, x, t, ctx,
                    deep_cache=cache, cache_branch=branch)

        return make_cached_eps_fns(apply_full, apply_shallow,
                                   self.sampler_cfg)

    def _denoise_ranged(self, eps_fn) -> Callable:
        """ranged(params, x, cond, uncond, lo, hi): the plain-denoise
        primitive the expansion paths share — deep-feature-cached when
        config.deep_cache (DDIM-only), otherwise denoise_range (which
        itself dispatches DDIM vs DPM-Solver++)."""
        sched = self.sched
        if not getattr(self.config, "deep_cache", False):
            def ranged(params, x, cond, uncond, lo, hi):
                return denoise_range(sched, eps_fn, params, x, cond,
                                     uncond, lo, hi)
            return ranged

        if isinstance(sched, DPMSchedule):
            raise NotImplementedError(
                "deep_cache composes with the DDIM solver only "
                "(config.scheduler='ddim')")
        from distdiff_tpu.sampling.deepcache import denoise_range_cached

        eps_full, eps_shallow = self.cached_eps_fns()
        interval = self.config.cache_interval

        def ranged(params, x, cond, uncond, lo, hi):
            return denoise_range_cached(
                sched, eps_full, eps_shallow, params, x, cond, uncond,
                lo, hi, interval)
        return ranged

    def decode_latents(self, params, latents: jnp.ndarray) -> jnp.ndarray:
        """Latents -> images in [-1, 1] (fp32)."""
        z = latents.astype(jnp.float32) / self.config.vae.scaling_factor
        return self.vae.apply(
            {"params": params["vae"]}, z, method=self.vae.decode
        )

    def encode_images(self, params, images: jnp.ndarray, rng=None) -> jnp.ndarray:
        """[-1,1] images -> scaled latents (the cached-latent convention,
        ``dataloader.py:804-806``)."""
        z = self.vae.apply(
            {"params": params["vae"]}, images, rng, method=self.vae.encode
        )
        return z * self.config.vae.scaling_factor

    def encode_text(self, params, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.text_encoder.apply({"params": params["text"]}, input_ids)

    def encode_text_pair(
        self, params, ids_1: jnp.ndarray, ids_2: jnp.ndarray,
        time_ids: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """SDXL conditioning from the two tokenizations of one prompt:
        {"ctx": [B, T, 768+1280], "add": [B, 2816]} — CLIP-L penultimate ⊕
        bigG penultimate for the context; bigG's projected pooled embedding
        plus the sinusoidal time-id embedding for the additive vector.
        ``time_ids`` defaults to square generation at ``sample_size``."""
        from distdiff_tpu.sampling.sdxl import (
            default_time_ids,
            time_ids_embedding,
        )

        assert self.text_encoder_2 is not None, "SDXL-only (text_encoder_2)"
        h1 = self.text_encoder.apply(
            {"params": params["text"]}, ids_1,
            method=self.text_encoder.penultimate_hidden,
        )
        h2, pooled = self.text_encoder_2.apply(
            {"params": params["text_2"]}, ids_2,
            method=self.text_encoder_2.sdxl_outputs,
        )
        if time_ids is None:
            time_ids = default_time_ids(pooled.shape[0],
                                        self.config.sample_size)
        dim = (self.config.unet.addition_embed_dim - pooled.shape[-1]) // 6
        add = jnp.concatenate(
            [pooled, time_ids_embedding(time_ids, dim)], axis=-1
        )
        return {"ctx": jnp.concatenate([h1, h2], axis=-1), "add": add}

    def guide_decode_fn(self, params, x0_latent: jnp.ndarray) -> jnp.ndarray:
        """pred_x0 latents -> 224² guide-ready images.

        Matches the reference exactly: VAE decode, NO denormalization
        (``postprocess(do_denormalize=False)`` is a no-op), bicubic resize
        to 224 (``generate_data.py:701-704``).
        """
        img = self.decode_latents(params, x0_latent)
        b = img.shape[0]
        size = self.guidance_cfg.guide_input_size
        return jax.image.resize(img, (b, size, size, 3), method="bicubic")

    def guide_encode_fn(self, params, images: jnp.ndarray) -> jnp.ndarray:
        assert self.guide is not None, "guidance requires a guide model"
        return self.guide.module.apply(
            params["guide"], images, method=self.guide.module.encode_image
        ).astype(jnp.float32)

    def guidance_context(self) -> GuidanceContext:
        """Build the rollout closure set for the guidance optimizers.

        ``rollout_remat`` modes "step_nru"/"step_nr" swap in no-inner-remat
        module INSTANCES (same params — ``nn.remat`` is parameter-neutral)
        for the rollout only: with the outer per-step ``jax.checkpoint``
        still bounding liveness to one step, dropping the inner block remat
        lets the backward reuse the recomputed step's activations instead of
        re-forwarding every block a second time (~1 extra forward per step).
        "step_nru" lifts it for the UNet only; "step_nr" lifts the 512^2
        VAE decoder too. Both OOM at SD-1.5 bench batch 8 on v5e-1 (full
        no-remat saves — GEGLU inners, attention projections — far exceed
        block boundaries); they remain useful at smaller batches.
        "decode_nr"/"tail_decode_nr" lift ONLY the VAE decoder's inner
        remat (UNet keeps nn.remat), the measured ~155ms/step re-forward.
        """
        mode = self.guidance_cfg.rollout_remat
        eps_fn = self.eps_fn(exact=True)  # int8 never inside the guide leg
        decode_fn = lambda p, z: self.guide_decode_fn(p, z)  # noqa: E731
        if mode in ("step_nru", "step_nr"):
            unet_nr = UNet2DCondition(
                dataclasses.replace(self.config.unet, remat=False)
            )
            def unet_apply_nr(p, x, t, ctx):
                if isinstance(ctx, dict):
                    return unet_nr.apply(
                        {"params": p["unet"]}, x, t, ctx["ctx"], ctx["add"]
                    )
                return unet_nr.apply({"params": p["unet"]}, x, t, ctx)
            eps_fn = make_eps_fn(unet_apply_nr, self.sampler_cfg)
        if mode in ("step_nr", "decode_nr", "tail_decode_nr"):
            vae_nr = AutoencoderKL(
                dataclasses.replace(self.config.vae, remat=False)
            )
            def decode_fn(p, z):  # noqa: F811
                img = vae_nr.apply(
                    {"params": p["vae"]},
                    z.astype(jnp.float32) / self.config.vae.scaling_factor,
                    method=vae_nr.decode,
                )
                b = img.shape[0]
                size = self.guidance_cfg.guide_input_size
                return jax.image.resize(
                    img, (b, size, size, 3), method="bicubic"
                )
        return GuidanceContext(
            sched=self.sched,
            eps_fn=eps_fn,
            decode_fn=decode_fn,
            encode_fn=lambda p, im: self.guide_encode_fn(p, im),
            cfg=self.guidance_cfg,
            global_protos=self.global_protos,
            local_protos=self.local_protos,
        )

    def full_params(self) -> Dict[str, Any]:
        p = dict(self.params)
        if self.guide is not None:
            p["guide"] = self.guide.variables
        return p

    def guidance_active(self, text_to_img: bool = False) -> bool:
        """Whether the guidance window survives clamping to the img2img
        start index under this pipeline's step plan / strength.

        The reference silently produces unguided samples when the window
        falls before the first executed step (``generate_data.py:1190-1215``
        — e.g. ``--strength 0.3`` with the default guidance_step, or a
        short ``--steps`` plan). We keep that parity in the hot path but
        expose the fact so callers (bench.py, CLIs) can label the run
        honestly instead of reporting a "guided" metric that never ran
        the guide leg."""
        gcfg = self.guidance_cfg
        if gcfg.guidance_type not in ("transform_guidance",
                                      "direct_guidance"):
            return False
        start = 0 if text_to_img else img2img_start_index(
            self.sched, self.strength)
        g0, g1 = guidance_window(self.sched, gcfg.guidance_step,
                                 gcfg.guidance_period)
        guided, _, _ = _clamp_window(
            gcfg.guidance_type, start, g0, g1,
            step_in_plan=getattr(gcfg, "step_in_plan", False),
            n=self.sched.num_inference_steps)
        return guided

    def make_split_expand(
        self, text_to_img: bool = False, mesh=None,
        guide_chunk: Optional[int] = None,
        decode_chunk: Optional[int] = None,
        param_shardings=None,
    ) -> "SplitExpand":
        """Expansion hot path as a few separately-compiled programs — much
        faster to compile than the fused ``make_expand_fn`` program (see
        SplitExpand docstring); prefer it on cold compile caches.
        ``guide_chunk`` bounds guidance-backward memory: host-side slicing
        on a single chip, or (with ``mesh``) an in-program scan over chunks
        with each sub-batch sharded over the data axis.
        ``decode_chunk`` bounds the tail denoise+decode span's activation
        memory the same way (single-chip guided path; samples are
        independent) — SD-2.1 768^2 needs it beyond batch 2 on a v5e-1.
        ``param_shardings``: NamedSharding pytree for the params argument
        (tensor-parallel expansion over a ``data x model`` mesh,
        parallel/tp.py); default replicated."""
        return SplitExpand(self, text_to_img=text_to_img, mesh=mesh,
                           guide_chunk=guide_chunk, decode_chunk=decode_chunk,
                           param_shardings=param_shardings)

    # ---- the compiled hot path ----
    def make_expand_fn(self, text_to_img: bool = False) -> Callable:
        """Build expand(params, image_latents, cond, uncond, targets, key)
        -> final images [B, H, W, 3] in [0, 1]. jit once, reuse per batch.

        ``text_to_img`` starts from pure noise over the full step plan
        (the reference's ``--text_to_img``, ``generate_data.py:1150-1158``,
        which has a latent ``generator`` NameError there — we implement the
        intended behavior); ``image_latents`` is then only a shape donor.
        """
        sched = self.sched
        eps_fn = self.eps_fn()
        gcfg = self.guidance_cfg
        start = 0 if text_to_img else img2img_start_index(sched, self.strength)
        n = sched.num_inference_steps
        guided = gcfg.guidance_type in ("transform_guidance", "direct_guidance")
        if guided:
            g0, g1 = guidance_window(sched, gcfg.guidance_step, gcfg.guidance_period)
            guided, g0, g1 = _clamp_window(
                gcfg.guidance_type, start, g0, g1,
                step_in_plan=getattr(gcfg, "step_in_plan", False), n=n)
        if guided:
            ctx = self.guidance_context()

        decode = self.decode_latents
        ranged = self._denoise_ranged(eps_fn)

        def expand(params, image_latents, cond, uncond, targets, key):
            # key: single PRNG key, or per-sample [B] key array (the sharded
            # driver passes per-work-unit keys so outputs don't depend on
            # batch composition or shard count).
            if key.ndim >= 1 and key.shape[0] == image_latents.shape[0]:
                k_noise = jax.vmap(lambda k: jax.random.fold_in(k, 0))(key)
                k_guide = jax.vmap(lambda k: jax.random.fold_in(k, 1))(key)
            else:
                k_noise, k_guide = jax.random.split(key)
            if text_to_img:
                if k_noise.ndim >= 1 and k_noise.shape[0] == image_latents.shape[0]:
                    latents = jax.vmap(
                        lambda k, x: jax.random.normal(k, x.shape, jnp.float32)
                    )(k_noise, image_latents)
                else:
                    latents = jax.random.normal(
                        k_noise, image_latents.shape, jnp.float32
                    )
            else:
                latents, _ = img2img_init(
                    sched, image_latents, k_noise, self.strength,
                    offset_noise=self.offset_noise,
                )
            if not guided:
                latents = ranged(params, latents, cond, uncond, start, n)
            elif gcfg.guidance_type == "transform_guidance":
                # plain to the window, one affine-optimization at g0, then
                # plain from g0 (the trigger step itself denoises normally
                # after the update — generate_data.py:1202-1207).
                latents = ranged(params, latents, cond, uncond, start, g0)
                latents, _score = transform_guidance(
                    ctx, params, latents, cond, uncond, targets, k_guide, g0
                )
                latents = ranged(params, latents, cond, uncond, g0, n)
            else:  # direct_guidance advances [g0, g1) itself
                latents = ranged(params, latents, cond, uncond, start, g0)
                latents, _score = direct_guidance(
                    ctx, params, latents, cond, uncond, targets, (g0, g1)
                )
                latents = ranged(params, latents, cond, uncond, g1, n)
            img = decode(params, latents)
            # final postprocess denormalizes (generate_data.py:1228-1230)
            return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

        return expand


def _make_chunked_guide(guide_body, chunk: int, mesh):
    """Wrap the guidance update in a lax.scan over batch chunks, each chunk
    sharded over the mesh's data axis. Bounds the guidance-backward HBM
    peak per device while composing with sharded execution (the host-side
    slicing path is single-chip-only)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    chunk_shard = NamedSharding(mesh, P(None, "data"))

    def reshape_chunks(a):
        nc = a.shape[0] // chunk
        a = a.reshape((nc, chunk) + a.shape[1:])
        return jax.lax.with_sharding_constraint(a, chunk_shard)

    def chunked(params, x, cond, uncond, targets, keys):
        b = x.shape[0]
        if b <= chunk:
            return guide_body(params, x, cond, uncond, targets, keys)
        assert b % chunk == 0, (b, chunk)
        xs = jax.tree.map(reshape_chunks, (x, cond, uncond, targets, keys))

        def body(carry, sl):
            xc, cc, uc, tc, kc = sl
            return carry, guide_body(params, xc, cc, uc, tc, kc)

        _, ys = jax.lax.scan(body, 0, xs)
        ys = jax.lax.with_sharding_constraint(ys, chunk_shard)
        return ys.reshape((b,) + ys.shape[2:])

    return chunked


def cast_params_bf16(params):
    """Store fp32 parameters as bf16 (halves HBM weight reads; ~3.4GB/call
    for the SD UNet otherwise). Norm scales/biases are tiny — casting them
    too is fine because all normalization statistics are computed fp32."""
    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if hasattr(p, "dtype") and p.dtype == jnp.float32 else p,
        params,
    )


def _per_sample_keys(key, batch):
    if key.ndim >= 1 and key.shape[0] == batch:
        k_noise = jax.vmap(lambda k: jax.random.fold_in(k, 0))(key)
        k_guide = jax.vmap(lambda k: jax.random.fold_in(k, 1))(key)
    else:
        k_noise, k_guide = jax.random.split(key)
    return k_noise, k_guide


class SplitExpand:
    """The expansion hot path as a few separately-compiled programs.

    The single fused program (``make_expand_fn``) duplicates the UNet graph
    ~8x (two denoise loops + the guidance rollout forward and backward),
    which can take tens of minutes on slow compile services. This variant
    compiles:
      * ``init``   — img2img noising (tiny)
      * ``span``   — ONE fori_loop over [lo, hi) with traced bounds
                     (a single UNet instance, reused for both plain ranges)
      * ``guide``  — the guidance update (transform: affine optimization at
                     the window; direct: one guided step, reused per window
                     index via a traced step index)
      * ``decode`` — final VAE decode + denormalize
    Runtime cost is 4-6 dispatches per batch instead of 1.
    """

    def __init__(self, pipe: "ExpansionPipeline", text_to_img: bool = False,
                 mesh=None, guide_chunk: Optional[int] = None,
                 decode_chunk: Optional[int] = None, param_shardings=None):
        """``guide_chunk``: run the guidance update on sub-batches of this
        size (exact — samples are independent in the per-sample energy
        formulation); bounds the guidance backward's HBM footprint so the
        denoise spans can run larger batches. ``decode_chunk``: likewise
        for the tail denoise+decode span (single-chip guided path only —
        under a mesh, host slicing would cross shards)."""
        self.pipe = pipe
        self.guide_chunk = guide_chunk
        self.decode_chunk = decode_chunk if mesh is None else None
        sched = pipe.sched
        eps_fn = pipe.eps_fn()
        gcfg = pipe.guidance_cfg
        self.start = 0 if text_to_img else img2img_start_index(
            sched, pipe.strength
        )
        self.n = sched.num_inference_steps
        self.guided = gcfg.guidance_type in (
            "transform_guidance", "direct_guidance"
        )
        self.gcfg = gcfg
        if self.guided:
            self.g0, self.g1 = guidance_window(
                sched, gcfg.guidance_step, gcfg.guidance_period
            )
            self.guided, self.g0, self.g1 = _clamp_window(
                gcfg.guidance_type, self.start, self.g0, self.g1,
                step_in_plan=getattr(gcfg, "step_in_plan", False),
                n=self.n,
            )
        if self.guided:
            self.ctx = pipe.guidance_context()

        def init_fn(params, image_latents, keys):
            del params
            k_noise, _ = _per_sample_keys(keys, image_latents.shape[0])
            if text_to_img:
                if k_noise.ndim >= 1 and k_noise.shape[0] == image_latents.shape[0]:
                    return jax.vmap(
                        lambda k, x: jax.random.normal(k, x.shape, jnp.float32)
                    )(k_noise, image_latents)
                return jax.random.normal(
                    k_noise, image_latents.shape, jnp.float32
                )
            lat, _ = img2img_init(sched, image_latents, k_noise, pipe.strength,
                                  offset_noise=pipe.offset_noise)
            return lat

        if getattr(pipe.config, "deep_cache", False):
            # cached spans: same ranged primitive as the fused path (cache
            # cold per span; the guidance dispatch between spans stays exact)
            span_fn = pipe._denoise_ranged(eps_fn)
        else:
            def span_fn(params, x, cond, uncond, lo, hi):
                if isinstance(sched, DPMSchedule):
                    # multistep solver: carry-based loop (handles traced
                    # bounds); x0 history resets per span, matching the
                    # guidance splice
                    return denoise_range_dpm(
                        sched, eps_fn, params, x, cond, uncond, lo, hi)

                def body(i, xx):
                    t = sched.timesteps[i]
                    e = eps_fn(params, xx, t, cond, uncond)
                    xp, _ = ddim_step(sched, e, i, xx)
                    return xp

                return jax.lax.fori_loop(lo, hi, body, x)

        def decode_fn(params, x):
            img = pipe.decode_latents(params, x)
            return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

        # Fuse the cheap stages into the spans: 3 dispatches per guided
        # batch instead of 5 (each dispatch pays a tunnel round trip).
        def init_span_fn(params, image_latents, cond, uncond, keys, lo, hi):
            x = init_fn(params, image_latents, keys)
            return span_fn(params, x, cond, uncond, lo, hi)

        def span_decode_fn(params, x, cond, uncond, lo, hi):
            x = span_fn(params, x, cond, uncond, lo, hi)
            return decode_fn(params, x)

        def full_fn(params, image_latents, cond, uncond, keys, lo, hi):
            x = init_fn(params, image_latents, keys)
            x = span_fn(params, x, cond, uncond, lo, hi)
            return decode_fn(params, x)

        # span bounds are scalars: replicate them, not shard
        if mesh is not None:
            from distdiff_tpu.parallel.mesh import data_sharding, replicated

            shard = data_sharding(mesh)
            repl = replicated(mesh)
            # params slot: replicated by default; a sharding pytree under
            # tensor parallelism (data x model mesh, parallel/tp.py)
            psh = param_shardings if param_shardings is not None else repl
            self.init_span = jax.jit(
                init_span_fn,
                in_shardings=(psh, shard, shard, shard, shard, repl, repl),
                out_shardings=shard,
            )
            self.span_decode = jax.jit(
                span_decode_fn,
                in_shardings=(psh, shard, shard, shard, repl, repl),
                out_shardings=shard,
            )
            self.full = jax.jit(
                full_fn,
                in_shardings=(psh, shard, shard, shard, shard, repl, repl),
                out_shardings=shard,
            )
        else:
            self.init_span = jax.jit(init_span_fn)
            self.span_decode = jax.jit(span_decode_fn)
            self.full = jax.jit(full_fn)

        if self.guided:
            if gcfg.guidance_type == "transform_guidance":
                def guide_body(params, x, cond, uncond, targets, keys):
                    _, k_guide = _per_sample_keys(keys, x.shape[0])
                    out, _score = transform_guidance(
                        self.ctx, params, x, cond, uncond, targets, k_guide,
                        self.g0,
                    )
                    return out
            else:
                from distdiff_tpu.guidance.optimize import direct_guidance_step

                def guide_body(params, x, cond, uncond, targets, keys):
                    # direct mode runs per window step; step indices are
                    # static here (window is small), one program per index
                    # is avoided by folding the loop into this program —
                    # it is the guidance cost that dominates, not the count.
                    out = x
                    for i in range(self.g0, self.g1):
                        out, _ = direct_guidance_step(
                            self.ctx, params, out, cond, uncond, targets, i
                        )
                    return out

            if mesh is not None and guide_chunk is not None:
                # Chunk WITHIN the jitted program: scan over a replicated
                # chunk axis with each sub-batch sharded over the data axis
                # (VERDICT r2 #5 — host-side slices would cross shards).
                # Memory: only one chunk's guidance backward is live at a
                # time, per device, exactly as on a single chip.
                n_dev = int(np.prod(list(mesh.shape.values())))
                assert guide_chunk % mesh.shape.get("data", n_dev) == 0, (
                    "guide_chunk must be a multiple of the data-axis size",
                    guide_chunk, dict(mesh.shape))
                self.guide = jax.jit(
                    _make_chunked_guide(guide_body, guide_chunk, mesh),
                    in_shardings=(psh, shard, shard, shard, shard, shard),
                    out_shardings=shard,
                )
                self._mesh_chunked = True
            elif mesh is not None:
                self.guide = jax.jit(
                    guide_body,
                    in_shardings=(psh, shard, shard, shard, shard, shard),
                    out_shardings=shard,
                )
            else:
                self.guide = jax.jit(guide_body)

    def __call__(self, params, image_latents, cond, uncond, targets, keys):
        if not self.guided:
            return self.full(
                params, image_latents, cond, uncond, keys, self.start, self.n
            )
        x = self.init_span(
            params, image_latents, cond, uncond, keys, self.start, self.g0
        )
        b = x.shape[0]
        if getattr(self, "_mesh_chunked", False):
            # chunking happens inside the jitted program (scan over chunks)
            x = self.guide(params, x, cond, uncond, targets, keys)
        elif self.guide_chunk is not None and self.guide_chunk < b:
            from distdiff_tpu.sampling.conditioning import cond_slice

            assert b % self.guide_chunk == 0, (b, self.guide_chunk)
            c = self.guide_chunk
            parts = [
                self.guide(params, x[i:i + c], cond_slice(cond, i, i + c),
                           cond_slice(uncond, i, i + c), targets[i:i + c],
                           keys[i:i + c])
                for i in range(0, b, c)
            ]
            x = jnp.concatenate(parts, axis=0)
        else:
            x = self.guide(params, x, cond, uncond, targets, keys)
        resume = self.g0 if self.gcfg.guidance_type == "transform_guidance" \
            else self.g1
        if self.decode_chunk is not None and self.decode_chunk < b:
            from distdiff_tpu.sampling.conditioning import cond_slice

            assert b % self.decode_chunk == 0, (b, self.decode_chunk)
            c = self.decode_chunk
            return jnp.concatenate([
                self.span_decode(params, x[i:i + c],
                                 cond_slice(cond, i, i + c),
                                 cond_slice(uncond, i, i + c), resume, self.n)
                for i in range(0, b, c)
            ], axis=0)
        return self.span_decode(params, x, cond, uncond, resume, self.n)


def _unet_init_args(config: PipelineConfig):
    ls = config.latent_size
    lat = jnp.zeros((1, ls, ls, config.unet.in_channels), jnp.float32)
    ctx = jnp.zeros((1, 8, config.unet.cross_attention_dim), jnp.float32)
    args = [lat, jnp.array([1]), ctx]
    if config.unet.addition_embed_dim is not None:
        args.append(
            jnp.zeros((1, config.unet.addition_embed_dim), jnp.float32))
    return args


def init_params(
    config: PipelineConfig,
    unet: UNet2DCondition,
    vae: AutoencoderKL,
    text_encoder: CLIPTextEncoder,
    seed: int = 0,
    text_encoder_2: Optional[CLIPTextEncoder] = None,
) -> Dict[str, Any]:
    """Random-init parameter trees (weight conversion fills real SD weights
    via distdiff_tpu.weights.convert when checkpoints are available)."""
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    img = jnp.zeros((1, config.sample_size, config.sample_size, 3), jnp.float32)
    ids = jnp.zeros((1, config.text_encoder.max_length), jnp.int32)
    uargs = _unet_init_args(config)
    params = {
        "unet": jax.jit(unet.init)(k1, *uargs)["params"],
        "vae": jax.jit(vae.init)(k2, img)["params"],
        "text": jax.jit(text_encoder.init)(k3, ids)["params"],
    }
    if text_encoder_2 is not None:
        ids2 = jnp.zeros((1, config.text_encoder_2.max_length), jnp.int32)
        params["text_2"] = jax.jit(text_encoder_2.init)(k4, ids2)["params"]
    return params


def init_params_lazy(
    config: PipelineConfig,
    unet: UNet2DCondition,
    vae: AutoencoderKL,
    text_encoder: CLIPTextEncoder,
    fill: float = 0.02,
    text_encoder_2: Optional[CLIPTextEncoder] = None,
) -> Dict[str, Any]:
    """Constant-filled parameter trees from eval_shape — NO init programs
    to compile. For benchmarking/compile checks where parameter values are
    irrelevant (throughput does not depend on weights); real runs load
    converted checkpoints instead."""
    img = jnp.zeros((1, config.sample_size, config.sample_size, 3), jnp.float32)
    ids = jnp.zeros((1, config.text_encoder.max_length), jnp.int32)
    key = jax.random.PRNGKey(0)
    uargs = _unet_init_args(config)

    def fill_tree(shapes):
        return jax.tree.map(
            lambda s: jnp.full(s.shape, fill, s.dtype), shapes
        )

    params = {
        "unet": fill_tree(
            jax.eval_shape(unet.init, key, *uargs)["params"]
        ),
        "vae": fill_tree(jax.eval_shape(vae.init, key, img)["params"]),
        "text": fill_tree(jax.eval_shape(text_encoder.init, key, ids)["params"]),
    }
    if text_encoder_2 is not None:
        ids2 = jnp.zeros((1, config.text_encoder_2.max_length), jnp.int32)
        params["text_2"] = fill_tree(
            jax.eval_shape(text_encoder_2.init, key, ids2)["params"])
    return params
