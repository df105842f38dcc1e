"""DDIM scheduler as a stateless JAX pytree.

Re-implements the denoising math the reference reaches through
``diffusers.DDIMScheduler`` (consumed at ``generate_data.py:109-121`` — the
``step`` there returns ``(prev_sample, pred_original_sample)`` and guidance
consumes ``pred_original_sample``), re-designed for XLA: the whole schedule is
a table of precomputed fp32 constants, ``step`` is a pure function of
``(schedule, eps, step_index, x)`` with only gathers inside — safe under
``jit``/``lax.scan`` with a traced ``step_index``.

Defaults match the Stable-Diffusion v1.x scheduler config
(``scaled_linear`` betas 8.5e-4→1.2e-2, 1000 train steps, ``steps_offset=1``,
``set_alpha_to_one=False``, ``clip_sample=False``, epsilon prediction,
"leading" timestep spacing), which is what the reference loads from
``CompVis/stable-diffusion-v1-4`` (``generate_data.py:863-864``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DDIMSchedule:
    """Precomputed diffusion schedule plus the inference-time timestep plan.

    All array leaves are fp32 device constants; scalar config is static
    (pytree aux data) so a schedule can close over a jitted sampler without
    retracing on value changes.
    """

    # fp32 tables over the full training discretization, shape [T].
    alphas_cumprod: jnp.ndarray
    # fp32 scalar, alpha-bar used when stepping past the start of the chain.
    final_alpha_cumprod: jnp.ndarray
    # int32 [num_inference_steps] — descending timesteps actually executed.
    timesteps: jnp.ndarray
    # fp32 [num_inference_steps] — alpha-bar gathered at each timestep.
    step_alphas: jnp.ndarray
    # fp32 [num_inference_steps] — alpha-bar of each step's *previous* timestep
    # (final_alpha_cumprod where the previous timestep falls off the chain).
    step_alphas_prev: jnp.ndarray

    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    num_inference_steps: int = struct.field(pytree_node=False, default=50)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")


def make_schedule(
    num_inference_steps: int = 50,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    steps_offset: int = 1,
    set_alpha_to_one: bool = False,
    prediction_type: str = "epsilon",
    timestep_spacing: str = "leading",
) -> DDIMSchedule:
    """Build the full schedule on host (numpy, fp64 intermediates) once."""
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(f"unknown beta_schedule: {beta_schedule}")

    alphas_cumprod = np.cumprod(1.0 - betas)
    final_alpha_cumprod = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])

    if timestep_spacing == "leading":
        step_ratio = num_train_timesteps // num_inference_steps
        timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy()
        timesteps += steps_offset
    elif timestep_spacing == "trailing":
        step_ratio = num_train_timesteps / num_inference_steps
        timesteps = np.round(np.arange(num_train_timesteps, 0, -step_ratio)) - 1
    else:
        raise ValueError(f"unknown timestep_spacing: {timestep_spacing}")
    timesteps = timesteps.astype(np.int64)

    # Previous timestep for each executed step (t - T/num_steps), may be < 0.
    prev_timesteps = timesteps - num_train_timesteps // num_inference_steps
    step_alphas = alphas_cumprod[timesteps]
    step_alphas_prev = np.where(
        prev_timesteps >= 0,
        alphas_cumprod[np.clip(prev_timesteps, 0, None)],
        final_alpha_cumprod,
    )

    return DDIMSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        final_alpha_cumprod=jnp.asarray(final_alpha_cumprod, jnp.float32),
        timesteps=jnp.asarray(timesteps, jnp.int32),
        step_alphas=jnp.asarray(step_alphas, jnp.float32),
        step_alphas_prev=jnp.asarray(step_alphas_prev, jnp.float32),
        num_train_timesteps=num_train_timesteps,
        num_inference_steps=num_inference_steps,
        prediction_type=prediction_type,
    )


def _pred_x0_and_eps(
    sched: DDIMSchedule, model_out: jnp.ndarray, alpha_t: jnp.ndarray, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    sqrt_a = jnp.sqrt(alpha_t)
    sqrt_1ma = jnp.sqrt(1.0 - alpha_t)
    if sched.prediction_type == "epsilon":
        eps = model_out
        x0 = (x - sqrt_1ma * eps) / sqrt_a
    elif sched.prediction_type == "v_prediction":
        x0 = sqrt_a * x - sqrt_1ma * model_out
        eps = sqrt_a * model_out + sqrt_1ma * x
    else:
        raise ValueError(f"unknown prediction_type: {sched.prediction_type}")
    return x0, eps


def ddim_step(
    sched: DDIMSchedule,
    model_out: jnp.ndarray,
    step_index: jnp.ndarray,
    x: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One deterministic (eta=0) DDIM update.

    Args:
      model_out: UNet prediction at ``timesteps[step_index]`` (epsilon or v).
      step_index: int index into the *inference* step plan (0 = most noisy);
        may be traced.
      x: current latents.

    Returns:
      ``(prev_sample, pred_original_sample)`` — same pair the reference's
      ``denoise_one_step`` unpacks (``generate_data.py:119-121``); guidance
      decodes ``pred_original_sample`` through the VAE.
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    out32 = model_out.astype(jnp.float32)
    alpha_t = sched.step_alphas[step_index]
    alpha_prev = sched.step_alphas_prev[step_index]

    x0, eps = _pred_x0_and_eps(sched, out32, alpha_t, x32)
    direction = jnp.sqrt(1.0 - alpha_prev) * eps
    prev = jnp.sqrt(alpha_prev) * x0 + direction
    return prev.astype(orig_dtype), x0.astype(orig_dtype)


def add_noise(
    sched: DDIMSchedule,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    timestep: jnp.ndarray,
) -> jnp.ndarray:
    """Forward-process noising ``x_t = sqrt(a_t) x0 + sqrt(1-a_t) eps``.

    ``timestep`` indexes the *training* discretization (as in the reference's
    ``scheduler.add_noise`` at img2img entry, ``generate_data.py:1161-1176``).
    """
    a = sched.alphas_cumprod[timestep].astype(jnp.float32)
    while a.ndim < x0.ndim:
        a = a[..., None]
    out = jnp.sqrt(a) * x0.astype(jnp.float32) + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)
    return out.astype(x0.dtype)


def img2img_start_index(sched: DDIMSchedule, strength: float) -> int:
    """Index into the step plan where img2img begins.

    Mirrors the reference's ``t_enc = timesteps[int((1-strength)*len)]``
    (``generate_data.py:1161-1176``): with 50 steps and strength 0.5, steps
    25..49 execute.
    """
    start = int((1.0 - strength) * sched.num_inference_steps)
    return min(max(start, 0), sched.num_inference_steps - 1)


def guidance_window(
    sched: DDIMSchedule, guidance_step: int, guidance_period: int
) -> Tuple[int, int]:
    """Static [start, end) indices of the guided steps in the plan.

    ``guidance_step`` counts from the END of the plan, exactly as the
    reference computes ``timesteps[len-guidance_step : len-guidance_step+
    guidance_period]`` (``generate_data.py:1178-1180``): 50 steps with
    guidance_step=20, period=2 guides plan indices 30 and 31.
    """
    n = sched.num_inference_steps
    start = n - guidance_step
    end = start + guidance_period
    if not (0 <= start < n and start < end <= n):
        raise ValueError(
            f"guidance window [{start},{end}) out of range for {n} steps"
        )
    return start, end


def schedule_config_dict(sched: DDIMSchedule) -> dict:
    return {
        f.name: getattr(sched, f.name)
        for f in dataclasses.fields(sched)
        if not isinstance(getattr(sched, f.name), (jnp.ndarray, jax.Array))
    }
