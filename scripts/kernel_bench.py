"""On-device kernel timing that survives a high-latency tunnel: run N
iterations inside ONE compiled program (lax.scan with a data dependency so
nothing is CSE'd/elided), time the single dispatch, subtract nothing —
per-iteration time = total / N for N large enough that dispatch overhead
vanishes.

  python scripts/kernel_bench.py --what attention
  python scripts/kernel_bench.py --what unet --iters 20
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def device_time(fn, args, iters: int, perturb_index: int = 0):
    """Time `fn(*args)` averaged over `iters` on-device iterations."""

    def scan_body(carry, i):
        args2 = list(args)
        a = args2[perturb_index]
        args2[perturb_index] = a + (i.astype(a.dtype) * jnp.asarray(1e-6, a.dtype))
        out = fn(*args2)
        # fold output into carry so every iteration is live
        leaves = jax.tree_util.tree_leaves(out)
        acc = carry + jnp.sum(leaves[0].astype(jnp.float32))
        return acc, ()

    @jax.jit
    def run():
        acc, _ = jax.lax.scan(
            scan_body, jnp.float32(0.0), jnp.arange(iters)
        )
        return acc

    run()  # compile + warm
    t0 = time.time()
    float(run())
    dt = (time.time() - t0) / iters
    return dt


def bench_attention(iters: int):
    from distdiff_tpu.ops.attention import xla_attention
    from distdiff_tpu.ops.flash import flash_attention

    rng = np.random.RandomState(0)
    shapes = [
        (2, 4096, 4096, 8, 40, "self 64x64"),
        (2, 1024, 1024, 8, 80, "self 32x32"),
        (2, 256, 256, 8, 160, "self 16x16"),
        (2, 4096, 77, 8, 40, "cross 64x64"),
        (2, 1024, 77, 8, 80, "cross 32x32"),
        (2, 16384, 16384, 8, 64, "sdxl self 128x128"),
    ]
    for b, tq, tk, h, d, tag in shapes:
        q = jnp.asarray(rng.randn(b, tq, h, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, tk, h, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, tk, h, d), jnp.bfloat16)
        it = max(4, iters // 4) if tq >= 16384 else iters
        t_flash = device_time(flash_attention, [q, k, v], it)
        t_xla = device_time(xla_attention, [q, k, v], it)
        flops = 2 * b * h * tq * tk * d * 2
        print(
            f"{tag:<20s} flash {t_flash * 1e3:8.3f} ms ({flops / t_flash / 1e12:6.1f} TF/s eff) "
            f"| xla {t_xla * 1e3:8.3f} ms",
            flush=True,
        )


def bench_unet(iters: int):
    from distdiff_tpu.config import PipelineConfig
    from distdiff_tpu.models import AutoencoderKL, UNet2DCondition
    from distdiff_tpu.models.text_encoder import CLIPTextEncoder
    from distdiff_tpu.sampling.pipeline import init_params_lazy

    cfg = PipelineConfig.sd15()
    unet = UNet2DCondition(cfg.unet)
    vae = AutoencoderKL(cfg.vae)
    te = CLIPTextEncoder(cfg.text_encoder)
    params = init_params_lazy(cfg, unet, vae, te)
    rng = np.random.RandomState(0)
    lat = jnp.asarray(rng.randn(2, 64, 64, 4), jnp.float32)
    ctx = jnp.asarray(rng.randn(2, 77, 768), jnp.float32)

    t = device_time(
        lambda x: unet.apply({"params": params["unet"]}, x, jnp.asarray(501), ctx),
        [lat], iters,
    )
    print(f"UNet fwd (CFG batch 2): {t * 1e3:8.2f} ms", flush=True)

    z = jnp.asarray(rng.randn(1, 64, 64, 4), jnp.float32)
    t = device_time(
        lambda zz: vae.apply({"params": params["vae"]}, zz, method=vae.decode),
        [z], max(4, iters // 2),
    )
    print(f"VAE decode 512^2 (b1):  {t * 1e3:8.2f} ms", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", choices=["attention", "unet", "all"], default="all")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)
    if args.what in ("attention", "all"):
        bench_attention(args.iters)
    if args.what in ("unet", "all"):
        bench_unet(args.iters)


if __name__ == "__main__":
    main()
