"""Component-level timing on the real chip: UNet / VAE / attention /
guidance breakdown for the SD-1.5 512^2 recipe. Run:
  python scripts/profile_components.py [--batch 1] [--trace /tmp/trace]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=1, name="", vary_arg=None):
    """vary_arg: index of an array arg to perturb per iteration (defeats
    any result caching between identical remote executions)."""
    args = list(args)

    def call(i):
        if vary_arg is not None:
            args[vary_arg] = args[vary_arg] + jnp.float32(i * 1e-6)
        return fn(*args)

    for w in range(warmup):
        out = call(w + 1000)
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [call(i) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / iters
    print(f"{name:<44s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--trace", type=str, default=None)
    args = p.parse_args()
    b = args.batch

    from distdiff_tpu.config import PipelineConfig
    from distdiff_tpu.models import AutoencoderKL, UNet2DCondition
    from distdiff_tpu.ops.attention import xla_attention
    from distdiff_tpu.ops.flash import flash_attention
    from distdiff_tpu.sampling.pipeline import init_params_lazy
    from distdiff_tpu.models.text_encoder import CLIPTextEncoder

    cfg = PipelineConfig.sd15()
    unet = UNet2DCondition(cfg.unet)
    vae = AutoencoderKL(cfg.vae)
    te = CLIPTextEncoder(cfg.text_encoder)
    params = init_params_lazy(cfg, unet, vae, te)
    rng = np.random.RandomState(0)

    lat2 = jnp.asarray(rng.randn(2 * b, 64, 64, 4), jnp.float32)
    ctx2 = jnp.asarray(rng.randn(2 * b, 77, 768), jnp.float32)
    unet_fn = jax.jit(
        lambda p, x, t, c: unet.apply({"params": p}, x, t, c)
    )
    print(f"batch={b} (UNet sees 2x for CFG)")
    t_unet = timeit(unet_fn, params["unet"], lat2, jnp.asarray(501), ctx2,
                    name="UNet fwd (CFG batch)", vary_arg=1)

    z = jnp.asarray(rng.randn(b, 64, 64, 4), jnp.float32)
    dec_fn = jax.jit(
        lambda p, zz: vae.apply({"params": p}, zz, method=vae.decode)
    )
    t_dec = timeit(dec_fn, params["vae"], z, name="VAE decode 512^2", vary_arg=1)

    # UNet fwd+bwd (the guidance gradient cost)
    grad_fn = jax.jit(jax.grad(
        lambda x: jnp.sum(unet.apply({"params": params["unet"]}, x,
                                     jnp.asarray(501), ctx2) ** 2)
    ))
    t_unet_bwd = timeit(grad_fn, lat2, name="UNet fwd+bwd", vary_arg=0)

    dec_grad = jax.jit(jax.grad(
        lambda zz: jnp.sum(
            vae.apply({"params": params["vae"]}, zz, method=vae.decode) ** 2
        )
    ))
    t_dec_bwd = timeit(dec_grad, z, name="VAE decode fwd+bwd", vary_arg=0)

    # attention shapes inside the SD UNet at 512^2 (per CFG-doubled batch)
    for (t_q, t_k, h, d, tag) in [
        (4096, 4096, 8, 40, "self 64x64"),
        (1024, 1024, 8, 80, "self 32x32"),
        (256, 256, 8, 160, "self 16x16"),
        (64, 64, 8, 160, "self 8x8"),
        (4096, 77, 8, 40, "cross 64x64"),
        (1024, 77, 8, 80, "cross 32x32"),
    ]:
        q = jnp.asarray(rng.randn(2 * b, t_q, h, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(2 * b, t_k, h, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(2 * b, t_k, h, d), jnp.bfloat16)
        timeit(jax.jit(flash_attention), q, k, v, name=f"flash {tag}", vary_arg=0)
        timeit(jax.jit(xla_attention), q, k, v, name=f"xla   {tag}", vary_arg=0)

    n_steps = 25
    est = n_steps * t_unet + t_dec
    print(f"\nestimate: {n_steps} denoise steps + final decode = {est:.3f}s "
          f"-> {b / est:.2f} img/s before guidance")

    if args.trace:
        with jax.profiler.trace(args.trace):
            unet_fn(params["unet"], lat2, jnp.asarray(501), ctx2)
            jax.effects_barrier()
        print("trace written to", args.trace, file=sys.stderr)


if __name__ == "__main__":
    main()
