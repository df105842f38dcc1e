"""DPM-Solver++(2M) scheduler — fast deterministic sampling (beyond-reference).

The reference is DDIM-only (``generate_data.py:863-864`` loads
``diffusers.DDIMScheduler``); users of modern SD stacks expect the
multistep DPM-Solver++ family for 2-3x fewer steps at equal quality
(Lu et al. 2022, "DPM-Solver++: Fast Solvers for Guided Sampling of
Diffusion Probabilistic Models" — the data-prediction 2M variant, the
diffusers ``DPMSolverMultistepScheduler(algorithm_type="dpmsolver++",
solver_order=2)`` default).

TPU design notes:
  * Like :mod:`distdiff_tpu.schedulers.ddim`, the whole schedule is a table
    of fp32 constants and the step is a pure function with only gathers —
    safe under ``jit``/``lax.fori_loop`` with a traced step index.
  * :class:`DPMSchedule` carries a SUPERSET of :class:`DDIMSchedule`'s
    fields, so every DDIM-facing consumer (``add_noise``,
    ``img2img_start_index``, the guidance rollout's ``ddim_step``) works on
    it unchanged by duck typing. The DistDiff guidance window (period-2)
    advances with the DDIM update and multistep history resets at the
    splice — the standard convention after any external latent
    modification (guidance rewrites the latents, invalidating the
    solver's x0 history).
  * The order-1/order-2 choice is data-independent (a function of the step
    index only), expressed as ``lax.select`` over both candidates — the
    extra elementwise blend is free next to the UNet call.
  * Final step targets the trained chain's smallest noise level
    (``set_alpha_to_one=False`` convention, matching our DDIM tables /
    diffusers ``final_sigmas_type="sigma_min"``).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from distdiff_tpu.schedulers.ddim import make_schedule


@struct.dataclass
class DPMSchedule:
    """DPM-Solver++(2M) tables. Field-superset of :class:`DDIMSchedule`."""

    # --- DDIMSchedule-compatible fields (duck-typed consumers) ---
    alphas_cumprod: jnp.ndarray
    final_alpha_cumprod: jnp.ndarray
    timesteps: jnp.ndarray
    step_alphas: jnp.ndarray
    step_alphas_prev: jnp.ndarray
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    num_inference_steps: int = struct.field(pytree_node=False, default=50)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")

    # --- DPM-Solver++ extras, all fp32 [num_inference_steps] ---
    # alpha_t = sqrt(abar), sigma_t = sqrt(1-abar), lambda_t = log(alpha/sigma)
    # at each executed plan step ...
    step_alpha_sqrt: jnp.ndarray = None
    step_sigma: jnp.ndarray = None
    step_lambda: jnp.ndarray = None
    # ... and at each step's TARGET (its "previous" timestep).
    prev_alpha_sqrt: jnp.ndarray = None
    prev_sigma: jnp.ndarray = None
    prev_lambda: jnp.ndarray = None
    # Use the first-order update on the very last step for few-step plans
    # (diffusers lower_order_final: stabilizes <15-step schedules).
    lower_order_final: bool = struct.field(pytree_node=False, default=True)


def make_dpm_schedule(
    num_inference_steps: int = 50,
    lower_order_final: bool = True,
    **kwargs,
) -> DPMSchedule:
    """Build DPM-Solver++ tables from the shared beta/timestep plan.

    Accepts every :func:`make_schedule` knob (beta schedule, spacing,
    prediction_type, ...); the underlying discretization is identical to the
    DDIM plan so img2img strength indexing and the guidance window land on
    the same timesteps.
    """
    base = make_schedule(num_inference_steps, **kwargs)
    abar = np.asarray(base.step_alphas, np.float64)
    abar_prev = np.asarray(base.step_alphas_prev, np.float64)

    def tables(a):
        alpha = np.sqrt(a)
        sigma = np.sqrt(1.0 - a)
        lam = np.log(alpha) - np.log(sigma)
        return (jnp.asarray(alpha, jnp.float32), jnp.asarray(sigma, jnp.float32),
                jnp.asarray(lam, jnp.float32))

    sa, ss, sl = tables(abar)
    pa, ps, pl = tables(abar_prev)
    return DPMSchedule(
        alphas_cumprod=base.alphas_cumprod,
        final_alpha_cumprod=base.final_alpha_cumprod,
        timesteps=base.timesteps,
        step_alphas=base.step_alphas,
        step_alphas_prev=base.step_alphas_prev,
        num_train_timesteps=base.num_train_timesteps,
        num_inference_steps=base.num_inference_steps,
        prediction_type=base.prediction_type,
        step_alpha_sqrt=sa, step_sigma=ss, step_lambda=sl,
        prev_alpha_sqrt=pa, prev_sigma=ps, prev_lambda=pl,
        lower_order_final=lower_order_final,
    )


def _pred_x0(sched: DPMSchedule, model_out, alpha, sigma, x):
    """Data prediction from the model output (the "++" parameterization)."""
    if sched.prediction_type == "epsilon":
        return (x - sigma * model_out) / alpha
    if sched.prediction_type == "v_prediction":
        return alpha * x - sigma * model_out
    raise ValueError(f"unknown prediction_type: {sched.prediction_type}")


def dpm_step(
    sched: DPMSchedule,
    model_out: jnp.ndarray,
    step_index: jnp.ndarray,
    x: jnp.ndarray,
    prev_x0: jnp.ndarray,
    has_prev: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DPM-Solver++(2M) update.

    Args:
      model_out: UNet prediction at ``timesteps[step_index]``.
      step_index: traced index into the inference plan.
      x: current latents.
      prev_x0: the PREVIOUS step's data prediction (same shape as ``x``;
        contents ignored when ``has_prev`` is false).
      has_prev: traced bool — whether ``prev_x0`` is valid (false on the
        first step of a segment, or right after guidance rewrote ``x``).

    Returns:
      ``(x_next, x0)`` — advance the trajectory and this step's data
      prediction (feed back as the next call's ``prev_x0``).
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    out32 = model_out.astype(jnp.float32)

    alpha_s = sched.step_alpha_sqrt[step_index]
    sigma_s = sched.step_sigma[step_index]
    lam_s = sched.step_lambda[step_index]
    alpha_t = sched.prev_alpha_sqrt[step_index]
    sigma_t = sched.prev_sigma[step_index]
    lam_t = sched.prev_lambda[step_index]

    x0 = _pred_x0(sched, out32, alpha_s, sigma_s, x32)

    h = lam_t - lam_s
    # h of the PREVIOUS executed step: its target is this step's source, so
    # h_last = lam_s - lam[step_index - 1] (clamped gather; the value is
    # unused when has_prev is false).
    lam_sm1 = sched.step_lambda[jnp.maximum(step_index - 1, 0)]
    h_last = lam_s - lam_sm1
    r = h_last / h
    # 2M combination: D = (1 + 1/2r) x0_s - (1/2r) x0_{s-1}
    d2 = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * prev_x0.astype(jnp.float32)

    n = sched.num_inference_steps
    use_second = has_prev
    if sched.lower_order_final and n < 15:
        use_second = jnp.logical_and(use_second, step_index < n - 1)
    d = jnp.where(use_second, d2, x0)

    x_next = (sigma_t / sigma_s) * x32 - alpha_t * jnp.expm1(-h) * d
    return x_next.astype(orig_dtype), x0.astype(jnp.float32)


def denoise_range_dpm(
    sched: DPMSchedule,
    eps_fn: Callable,
    params,
    latents: jnp.ndarray,
    cond,
    uncond,
    start: int,
    stop: int,
) -> jnp.ndarray:
    """Run plan steps [start, stop) under one fori_loop, carrying the
    multistep x0 history. Bounds may be static ints or traced scalars (the
    SplitExpand span program). History starts empty at ``start`` — each
    spliced segment (pre-/post-guidance) is solved independently."""
    if isinstance(start, int) and isinstance(stop, int) and stop <= start:
        return latents

    def body(i, carry):
        x, prev_x0, has_prev = carry
        t = sched.timesteps[i]
        out = eps_fn(params, x, t, cond, uncond)
        x_next, x0 = dpm_step(sched, out, i, x, prev_x0, has_prev)
        return x_next, x0, jnp.asarray(True)

    init = (latents, jnp.zeros(latents.shape, jnp.float32), jnp.asarray(False))
    x, _, _ = jax.lax.fori_loop(start, stop, body, init)
    return x
