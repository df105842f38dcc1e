"""jit-compiled DDIM samplers with classifier-free guidance.

This is the TPU re-design of the reference's eager per-step Python loop
(``generate_data.py:1130-1245``): the whole denoise trajectory compiles to a
single XLA program — a ``lax.fori_loop`` over plan indices with the CFG
duplication batched into one UNet call — and the DistDiff guidance window is
spliced in as *static* trace-time structure (the window indices are known
before compilation, exactly like the reference computes them up front at
``generate_data.py:1178-1180``).

Layout note: latents are NHWC ``[B, h, w, 4]``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from distdiff_tpu.schedulers import (
    DDIMSchedule,
    DPMSchedule,
    add_noise,
    ddim_step,
    denoise_range_dpm,
    guidance_window,
    img2img_start_index,
)


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    guidance_scale: float = 7.5
    do_classifier_free_guidance: bool = True


def make_eps_fn(unet_apply: Callable, cfg: SamplerConfig) -> Callable:
    """Build eps(params, x, t, cond, uncond): one CFG-merged UNet evaluation.

    Mirrors ``denoise_one_step``'s CFG mix (``generate_data.py:109-121``)
    but batches the uncond/text pair through a single UNet call so the MXU
    sees one 2B batch instead of two launches. ``cond``/``uncond`` are
    opaque conditioning pytrees (bare context array for SD-1.x,
    ``{"ctx", "add"}`` for SDXL — sampling.conditioning).
    """
    from distdiff_tpu.sampling.conditioning import cond_concat

    def eps_fn(params, x, t, cond, uncond):
        if cfg.do_classifier_free_guidance:
            x2 = jnp.concatenate([x, x], axis=0)
            ctx = cond_concat(uncond, cond)
            out = unet_apply(params, x2, t, ctx)
            eps_u, eps_t = jnp.split(out, 2, axis=0)
            return eps_u + cfg.guidance_scale * (eps_t - eps_u)
        return unet_apply(params, x, t, cond)

    return eps_fn


def denoise_range(
    sched: DDIMSchedule,
    eps_fn: Callable,
    params,
    latents: jnp.ndarray,
    cond: jnp.ndarray,
    uncond: jnp.ndarray,
    start: int,
    stop: int,
) -> jnp.ndarray:
    """Run plan steps [start, stop) under one fori_loop. Static bounds.

    Dispatches on the schedule type: a :class:`DPMSchedule` runs the
    multistep DPM-Solver++(2M) loop (x0-history carry, reset per segment);
    anything else takes the DDIM update."""
    if isinstance(sched, DPMSchedule):
        return denoise_range_dpm(
            sched, eps_fn, params, latents, cond, uncond, start, stop)
    if stop <= start:
        return latents

    def body(i, x):
        t = sched.timesteps[i]
        e = eps_fn(params, x, t, cond, uncond)
        x_prev, _ = ddim_step(sched, e, i, x)
        return x_prev

    return jax.lax.fori_loop(start, stop, body, latents)


def sample(
    sched: DDIMSchedule,
    eps_fn: Callable,
    params,
    init_latents: jnp.ndarray,
    cond: jnp.ndarray,
    uncond: jnp.ndarray,
    start_index: int = 0,
    guided_segment: Optional[Tuple[int, int, Callable]] = None,
) -> jnp.ndarray:
    """Denoise from plan index ``start_index`` to the end.

    ``guided_segment = (g0, g1, guide_fn)`` splices DistDiff guidance into
    the trajectory: plain steps [start, g0), then
    ``latents = guide_fn(params, latents, cond, uncond)`` which is
    responsible for advancing the trajectory over [g0, g1), then plain steps
    [g1, end). All of it traces into one XLA program.
    """
    n = sched.num_inference_steps
    x = init_latents
    if guided_segment is None:
        return denoise_range(sched, eps_fn, params, x, cond, uncond, start_index, n)

    g0, g1, guide_fn = guided_segment
    g0 = max(g0, start_index)
    x = denoise_range(sched, eps_fn, params, x, cond, uncond, start_index, g0)
    x = guide_fn(params, x, cond, uncond)
    x = denoise_range(sched, eps_fn, params, x, cond, uncond, g1, n)
    return x


def img2img_init(
    sched: DDIMSchedule,
    image_latents: jnp.ndarray,
    key: jax.Array,
    strength: float,
    offset_noise: bool = False,
) -> Tuple[jnp.ndarray, int]:
    """SDEdit entry: noise cached VAE latents to the strength-indexed
    timestep (``generate_data.py:1161-1176``). Returns (latents, start_idx).

    ``key`` may be a single key (one draw for the whole batch) or a
    per-sample [B] key array (noise independent of batch composition).
    ``offset_noise`` adds 0.1x a per-(sample, channel) scalar draw to the
    noise (``--offset_noise``, ``generate_data.py:1164-1168``; reference
    shape [B, C, 1, 1] — [B, 1, 1, C] in our NHWC layout)."""
    start = img2img_start_index(sched, strength)
    t_enc = sched.timesteps[start]

    def draw(k, x, batched):
        n = jax.random.normal(k, x.shape, jnp.float32)
        if offset_noise:
            # one scalar per (sample, channel): [B,1,1,C] batched,
            # [1,1,C] inside the per-sample vmap
            lead = (x.shape[0],) if batched else ()
            off = jax.random.normal(
                jax.random.fold_in(k, 0x0FF5E7),
                lead + (1,) * (x.ndim - 1 - len(lead)) + (x.shape[-1],),
                jnp.float32,
            )
            n = n + 0.1 * off
        return n

    if key.ndim >= 1 and key.shape[0] == image_latents.shape[0]:
        noise = jax.vmap(lambda k, x: draw(k, x, False))(key, image_latents)
    else:
        noise = draw(key, image_latents, image_latents.ndim == 4)
    noisy = add_noise(sched, image_latents.astype(jnp.float32), noise, t_enc)
    return noisy.astype(image_latents.dtype), start


def text2img_init(
    sched: DDIMSchedule,
    shape: Tuple[int, ...],
    key: jax.Array,
    init_noise_sigma: float = 1.0,
) -> Tuple[jnp.ndarray, int]:
    """Pure-noise entry (``--text_to_img``, ``generate_data.py:1150-1158``;
    the reference has a latent NameError there — we define the obvious
    correct behavior)."""
    return jax.random.normal(key, shape, jnp.float32) * init_noise_sigma, 0
