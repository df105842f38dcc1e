"""DistDiff guidance optimizers, expressed as jax.grad through the rollout.

The reference runs eager autograd through ``period`` UNet forwards + VAE
decodes + a guide-encoder forward and then SGD-steps a per-channel affine
(``transform_guidance``, ``generate_data.py:687-732``) or the latent itself
(``direct_guidance``, ``:735-767``). Here the entire rollout-and-update is a
pure jittable function: ``jax.grad`` differentiates through the compiled
rollout (with ``jax.checkpoint`` rematerialisation on each step so the
backward fits HBM — the role ``--gradient_checkpointing`` plays at
``generate_data.py:1049-1052``), and the whole guided trajectory fuses into
the surrounding sampler program instead of a separate eager phase.

Semantics preserved exactly (verified against the reference main loop at
``generate_data.py:1202-1218``):
  * transform: triggered once at the FIRST window step; returns updated
    latents at the same timestep; the caller then denoises normally from
    that step (the second window step is a plain DDIM step).
  * direct: runs at EVERY window step and advances the trajectory itself
    (returns the post-step latents, gradient-corrected).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from distdiff_tpu.config import GuidanceConfig
from distdiff_tpu.guidance.energy import hierarchical_energy_per_sample, normalize
from distdiff_tpu.schedulers import DDIMSchedule, ddim_step


@dataclasses.dataclass(frozen=True)
class GuidanceContext:
    """Everything the guidance optimizers close over.

    eps_fn(params, x, t, cond, uncond) -> CFG-merged epsilon
    decode_fn(params, x0_latent)       -> guide-ready images [B,224,224,3]
                                          (VAE decode / scaling + resize)
    encode_fn(params, images)          -> guide features [B, D] fp32
    """

    sched: DDIMSchedule
    eps_fn: Callable
    decode_fn: Callable
    encode_fn: Callable
    cfg: GuidanceConfig
    global_protos: Optional[jnp.ndarray]
    local_protos: Optional[jnp.ndarray]


def _step_energy(ctx: GuidanceContext, params, x, i, cond, uncond, targets,
                 do_normalize: bool, remat_decode: bool = False):
    """One DDIM step + decode + encode + per-sample energies [B].
    Remat'd in rollouts. ``remat_decode`` checkpoints ONLY the
    decode+encode leg (its residual is just the [B,h,w,4] pred-x0 latents;
    the VAE decoder's 512^2 block activations are the rollout's HBM hog)."""
    t = ctx.sched.timesteps[i]
    eps = ctx.eps_fn(params, x, t, cond, uncond)
    x_next, x0 = ddim_step(ctx.sched, eps, i, x)
    feat_fn = lambda p, z: ctx.encode_fn(p, ctx.decode_fn(p, z))  # noqa: E731
    if remat_decode:
        feat_fn = jax.checkpoint(feat_fn)
    feats = feat_fn(params, x0)
    if do_normalize:
        feats = normalize(feats)
    e = hierarchical_energy_per_sample(
        feats, targets,
        ctx.global_protos if ctx.cfg.wants_global() else None,
        ctx.local_protos if ctx.cfg.wants_local() else None,
        gs=ctx.cfg.gs, ls=ctx.cfg.ls,
    )
    return x_next, e


def transform_guidance(
    ctx: GuidanceContext,
    params,
    latents: jnp.ndarray,          # [B, h, w, C] at window start
    cond: jnp.ndarray,
    uncond: jnp.ndarray,
    targets: jnp.ndarray,
    key: jax.Array,
    window_start: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Channel-affine optimization (reference mode; default in
    ``scripts/exps/expand_diff.sh:12``). Returns (updated latents at the
    same plan index, score)."""
    cfg = ctx.cfg
    c = latents.shape[-1]
    # NHWC: per-channel params live on the trailing axis (reference uses
    # [B,C,1,1] in NCHW, generate_data.py:692-695). ``key`` may be a single
    # key or a per-sample [B] key array — per-sample keys make each work
    # unit's output independent of batch composition and shard count.
    if key.ndim >= 1 and key.shape[0] == latents.shape[0]:
        gamma0 = jax.vmap(
            lambda k: jax.random.uniform(jax.random.fold_in(k, 0), (1, 1, c))
        )(key)
        beta0 = jax.vmap(
            lambda k: jax.random.normal(jax.random.fold_in(k, 1), (1, 1, c))
        )(key)
    else:
        b = latents.shape[0]
        k_gamma, k_beta = jax.random.split(key)
        gamma0 = jax.random.uniform(k_gamma, (b, 1, 1, c), jnp.float32)
        beta0 = jax.random.normal(k_beta, (b, 1, 1, c), jnp.float32)
    do_norm = (
        cfg.normalize_features if cfg.normalize_features is not None else False
    )

    lat32 = latents.astype(jnp.float32)

    def loss(gb):
        gamma, beta = gb
        x = (lat32 * (1.0 + gamma) + beta).astype(latents.dtype)
        score = jnp.zeros(latents.shape[0], jnp.float32)
        step = lambda xx, ii: _step_energy(  # noqa: E731
            ctx, params, xx, ii, cond, uncond, targets, do_norm,
            remat_decode=(cfg.rollout_remat == "decode"),
        )
        mode = cfg.rollout_remat
        ckpt = step
        if mode.startswith("step") or mode in ("decode_nr",) or \
                mode.startswith("tail"):
            # outer remat on top of the models' inner nn.remat: minimal HBM,
            # backward pays one extra forward recompute per step
            ckpt = jax.checkpoint(step, static_argnums=(1,))
        steps = list(range(window_start, window_start + cfg.guidance_period))
        for idx, i in enumerate(steps):
            # "tail*" modes: the LAST rollout step's backward runs first,
            # so skipping its outer checkpoint keeps only one step's
            # block-boundary residuals live while saving a full step
            # re-forward in the backward.
            s = step if (mode.startswith("tail") and idx == len(steps) - 1) \
                else ckpt
            x, e = s(x, i)
            score = score + e
        score = score / cfg.guidance_period  # per-sample scores [B]
        # Sum over the batch: samples are independent, so each sample's
        # gamma/beta gradient equals its batch-1 gradient (the reference
        # runs batch 1; its batch-mean would shrink gradients by 1/B).
        return score.sum(), score

    (_, score), (g_gamma, g_beta) = jax.value_and_grad(loss, has_aux=True)(
        (gamma0, beta0)
    )
    gamma = gamma0 - cfg.rho * g_gamma
    beta = beta0 - cfg.rho * g_beta

    updated = lat32 * (1.0 + gamma) + beta
    # l-inf projection around the ORIGINAL latents (generate_data.py:726-728)
    updated = jnp.clip(
        updated, lat32 - cfg.constraint_value, lat32 + cfg.constraint_value
    )
    return jax.lax.stop_gradient(updated).astype(latents.dtype), score


def direct_guidance_step(
    ctx: GuidanceContext,
    params,
    latents: jnp.ndarray,
    cond: jnp.ndarray,
    uncond: jnp.ndarray,
    targets: jnp.ndarray,
    step_index: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One guided step of the alternative mode: advance the trajectory and
    descend the energy gradient on the latent (``generate_data.py:735-767``;
    features are L2-normalized there, unlike transform mode)."""
    cfg = ctx.cfg
    do_norm = (
        cfg.normalize_features if cfg.normalize_features is not None else True
    )

    def loss(x):
        x_next, e = _step_energy(
            ctx, params, x, step_index, cond, uncond, targets, do_norm
        )
        # sum over independent samples (see transform_guidance note)
        return e.sum(), (x_next, e)

    (_, (x_next, score)), gx = jax.value_and_grad(loss, has_aux=True)(latents)
    out = x_next - cfg.rho * gx
    return jax.lax.stop_gradient(out), score


def direct_guidance(
    ctx: GuidanceContext,
    params,
    latents: jnp.ndarray,
    cond: jnp.ndarray,
    uncond: jnp.ndarray,
    targets: jnp.ndarray,
    window: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run direct guidance over every plan index in [window)."""
    scores = []
    x = latents
    for i in range(*window):
        x, s = direct_guidance_step(ctx, params, x, cond, uncond, targets, i)
        scores.append(s)
    return x, jnp.stack(scores).mean()
