"""Per-leg timing of the transform_guidance rollout at bench shapes.

The guide dispatch is ~1.58s of the 4.54s batch (scripts/guide_probe.py,
"step" remat).  The rollout is 2 x (CFG UNet step -> pred-x0 decode ->
guide encode -> energy), differentiated w.r.t. the per-channel affine.
This probe times each leg separately, fwd-only and fwd+grad, so the
recompute/backward overhead can be attributed:

  unet leg   : eps_fn (CFG-16) + ddim_step, grad w.r.t. x
  decode leg : VAE decode 512^2 -> bicubic 224 -> guide encode -> energy,
               grad w.r.t. pred-x0 latents

  python scripts/guide_legs.py [--batch 8] [--iters 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, make_args, iters):
    t0 = time.time()
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    ts = []
    for i in range(iters):
        a = make_args(i + 1)
        jax.block_until_ready(a)
        t0 = time.time()
        jax.block_until_ready(fn(*a))
        ts.append(time.time() - t0)
    return compile_s, min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--legs", default="unet_f,unet_g,dec_f,dec_g,roll_f")
    args = p.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)

    import bench as bench_mod
    from distdiff_tpu.guidance.energy import (
        hierarchical_energy_per_sample,
    )
    from distdiff_tpu.sampling.pipeline import cast_params_bf16
    from distdiff_tpu.schedulers import ddim_step

    pipe, bench_args = bench_mod.build("sd15", args.batch)
    params0, lat0, cond, uncond, targets, keys = bench_args
    params = cast_params_bf16(pipe.full_params())
    ctx = pipe.guidance_context()
    g0 = 30
    t_g0 = ctx.sched.timesteps[g0]
    legs = set(args.legs.split(","))

    def unet_step(params, x):
        eps = ctx.eps_fn(params, x, t_g0, cond, uncond)
        x_next, x0 = ddim_step(ctx.sched, eps, g0, x)
        return x_next, x0

    def decode_energy(params, x0):
        feats = ctx.encode_fn(params, ctx.decode_fn(params, x0))
        e = hierarchical_energy_per_sample(
            feats, targets, ctx.global_protos, ctx.local_protos,
            gs=ctx.cfg.gs, ls=ctx.cfg.ls,
        )
        return e.sum()

    x0_probe = lat0  # same shape/dtype family as pred-x0

    if "unet_f" in legs:
        f = jax.jit(lambda p, x: unet_step(p, x)[0])
        c, t = timed(f, lambda i: (params, lat0 + jnp.float32(1e-6 * i)),
                     args.iters)
        print(f"unet fwd (CFG step)      compile {c:6.1f}s   {t*1e3:8.1f} ms",
              flush=True)
    if "unet_g" in legs:
        f = jax.jit(jax.grad(
            lambda x, p: jnp.sum(unet_step(p, x)[0].astype(jnp.float32))
        ))
        c, t = timed(f, lambda i: (lat0 + jnp.float32(1e-6 * i), params),
                     args.iters)
        print(f"unet fwd+dgrad           compile {c:6.1f}s   {t*1e3:8.1f} ms",
              flush=True)
    if "dec_f" in legs:
        f = jax.jit(decode_energy, static_argnums=())
        c, t = timed(
            f, lambda i: (params, x0_probe + jnp.float32(1e-6 * i)),
            args.iters)
        print(f"decode+enc+E fwd         compile {c:6.1f}s   {t*1e3:8.1f} ms",
              flush=True)
    if "dec_g" in legs:
        f = jax.jit(jax.grad(lambda x, p: decode_energy(p, x)))
        c, t = timed(
            f, lambda i: (x0_probe + jnp.float32(1e-6 * i), params),
            args.iters)
        print(f"decode+enc+E fwd+dgrad   compile {c:6.1f}s   {t*1e3:8.1f} ms",
              flush=True)
    if "roll_f" in legs:
        def rollout(params, x):
            e_sum = jnp.float32(0.0)
            for i in range(g0, g0 + 2):
                x, x0 = unet_step_at(params, x, i)
                e_sum = e_sum + decode_energy(params, x0)
            return e_sum

        def unet_step_at(params, x, i):
            eps = ctx.eps_fn(params, x, ctx.sched.timesteps[i], cond, uncond)
            return ddim_step(ctx.sched, eps, i, x)

        f = jax.jit(rollout)
        c, t = timed(f, lambda i: (params, lat0 + jnp.float32(1e-6 * i)),
                     args.iters)
        print(f"rollout fwd (2 steps)    compile {c:6.1f}s   {t*1e3:8.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
