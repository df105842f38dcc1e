"""Deep-feature-cached denoising (DeepCache-style, opt-in acceleration).

Adjacent denoise steps produce nearly identical deep-UNet features; caching
them and refreshing only the shallow high-resolution layers trades a small,
bounded approximation for a large step-cost reduction (Ma et al. 2023
DeepCache; the retrieved "Cache Me if You Can" block-caching paper is the
per-block generalization). This module supplies the TPU-shaped loop:

  * one ``lax.fori_loop`` whose carry is ``(x, cache, has_cache)``;
  * a static ``cache_interval`` schedule evaluated from the traced step
    index (``(i - start) % interval == 0`` -> full step), so the whole
    cached trajectory still compiles to ONE XLA program;
  * ``lax.cond`` between the full UNet (which also emits the fresh cache)
    and the shallow UNet (which consumes it) — both branches live in the
    same compiled program.

This is opt-in (``PipelineConfig.deep_cache``) and NEVER the default: the
official BASELINE.md DDIM-50 metric runs the exact full UNet every step.
The DistDiff guidance window always runs full UNet steps (its gradient
flows through the denoiser), and the cache resets at every segment
boundary, so guidance semantics are untouched.

Reference: the reference repo has no caching (eager full UNet per step,
``generate_data.py:1130-1245``); this is beyond-reference surface.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from distdiff_tpu.sampling.conditioning import cond_concat
from distdiff_tpu.sampling.sampler import SamplerConfig
from distdiff_tpu.schedulers import DDIMSchedule, ddim_step


def make_cached_eps_fns(
    unet_apply_full: Callable,     # (params, x, t, ctx) -> (out, cache)
    unet_apply_shallow: Callable,  # (params, x, t, ctx, cache) -> out
    cfg: SamplerConfig,
) -> Tuple[Callable, Callable]:
    """CFG-merged eps pair mirroring :func:`sampler.make_eps_fn`:

      eps_full(params, x, t, cond, uncond)           -> (eps, cache)
      eps_shallow(params, x, t, cond, uncond, cache) -> eps

    The cache lives on the CFG-duplicated 2B batch so cond/uncond deep
    features are both cached.
    """

    def eps_full(params, x, t, cond, uncond):
        if cfg.do_classifier_free_guidance:
            x2 = jnp.concatenate([x, x], axis=0)
            ctx = cond_concat(uncond, cond)
            out, cache = unet_apply_full(params, x2, t, ctx)
            eps_u, eps_t = jnp.split(out, 2, axis=0)
            return eps_u + cfg.guidance_scale * (eps_t - eps_u), cache
        return unet_apply_full(params, x, t, cond)

    def eps_shallow(params, x, t, cond, uncond, cache):
        if cfg.do_classifier_free_guidance:
            x2 = jnp.concatenate([x, x], axis=0)
            ctx = cond_concat(uncond, cond)
            out = unet_apply_shallow(params, x2, t, ctx, cache)
            eps_u, eps_t = jnp.split(out, 2, axis=0)
            return eps_u + cfg.guidance_scale * (eps_t - eps_u)
        return unet_apply_shallow(params, x, t, cond, cache)

    return eps_full, eps_shallow


def denoise_range_cached(
    sched: DDIMSchedule,
    eps_full: Callable,
    eps_shallow: Callable,
    params,
    latents: jnp.ndarray,
    cond,
    uncond,
    start,
    stop,
    interval: int,
) -> jnp.ndarray:
    """DDIM over plan steps [start, stop): a full UNet step every
    ``interval`` steps (and always the segment's first step), shallow
    cached steps in between. Bounds may be static or traced; the cache
    starts cold per segment, so guidance splices stay exact."""
    if isinstance(start, int) and isinstance(stop, int) and stop <= start:
        return latents
    if interval <= 1:
        # degenerate schedule: every step full (still traces one program)
        interval = 1

    # cache aval from an abstract forward (trace-time only, no FLOPs)
    cache_aval = jax.eval_shape(
        lambda xx: eps_full(params, xx, sched.timesteps[0], cond, uncond)[1],
        latents,
    )

    def body(i, carry):
        x, cache, has_cache = carry
        t = sched.timesteps[i]
        full = jnp.logical_or((i - start) % interval == 0,
                              jnp.logical_not(has_cache))

        def do_full(xx, _cache):
            return eps_full(params, xx, t, cond, uncond)

        def do_shallow(xx, cache_):
            return eps_shallow(params, xx, t, cond, uncond, cache_), cache_

        e, cache = jax.lax.cond(full, do_full, do_shallow, x, cache)
        x_next, _ = ddim_step(sched, e, i, x)
        return x_next, cache, jnp.asarray(True)

    init = (latents,
            jnp.zeros(cache_aval.shape, cache_aval.dtype),
            jnp.asarray(False))
    x, _, _ = jax.lax.fori_loop(start, stop, body, init)
    return x
