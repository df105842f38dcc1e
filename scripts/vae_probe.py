"""Probe the VAE decoder's building blocks at the bench batch (b8, 512^2).

The decode dispatch measures 175ms (~29% MXU for ~10 TFLOP) and the
guidance rollout pays ~6 decode-equivalents (2 fwd + remat'd backward) —
if the decoder convs are XLA-inefficient at the 512^2 x 128..512-channel
shapes, that's the next ~0.65s of the 5.1s batch.

  python scripts/vae_probe.py [--batch 8] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scripts.kernel_bench import device_time

PEAK = 197.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    b, it = args.batch, args.iters
    print(f"backend: {jax.default_backend()}  batch {b}", flush=True)
    rng = np.random.RandomState(0)

    # decoder stages: (spatial, channels, n_conv3x3-equivalents per decode)
    stages = [
        (512, 128, 7),   # up3: 3 resnets x2 convs + conv_out-ish
        (256, 256, 7),   # up2 + upsample conv
        (128, 512, 7),   # up1
        (64, 512, 13),   # conv_in + mid (2 res) + up0 (3 res) + attn proj
    ]
    total = 0.0
    for s, c, n in stages:
        x = jnp.asarray(rng.randn(b, s, s, c), jnp.bfloat16)
        conv = nn.Conv(c, (3, 3), padding=1, dtype=jnp.bfloat16)
        cp = conv.init(jax.random.PRNGKey(0), x)
        flops = 2 * b * s * s * 9 * c * c
        dt = device_time(lambda xx, cp=cp, conv=conv: conv.apply(cp, xx),
                        [x], it)
        total += dt * n
        print(f"conv3x3 {s}^2x{c:<4} {dt*1e3:8.3f} ms "
              f"({flops/dt/1e12:6.1f} TF/s, {flops/dt/1e12/PEAK*100:4.0f}%) "
              f"x{n} = {dt*n*1e3:7.1f} ms", flush=True)

        from distdiff_tpu.models.layers import GroupNorm

        gn = GroupNorm(dtype=jnp.bfloat16)
        gp = gn.init(jax.random.PRNGKey(0), x)
        dtg = device_time(lambda xx, gp=gp, gn=gn: gn.apply(gp, xx), [x],
                         it)
        total += dtg * n
        print(f"groupnorm {s}^2x{c:<4} {dtg*1e3:8.3f} ms x{n} = "
              f"{dtg*n*1e3:7.1f} ms", flush=True)

    print(f"estimated decode conv+gn total: {total*1e3:7.1f} ms "
          f"(vs measured decode dispatch ~175 ms at b8)", flush=True)

    # the real decode for reference
    from distdiff_tpu.config import PipelineConfig
    from distdiff_tpu.models import AutoencoderKL

    cfg = PipelineConfig.sd15()
    vae = AutoencoderKL(cfg.vae)
    z = jnp.asarray(rng.randn(b, 64, 64, 4), jnp.float32)
    shapes = jax.eval_shape(vae.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 512, 512, 3)))["params"]
    vp = jax.tree.map(lambda s_: jnp.full(s_.shape, 0.02, s_.dtype), shapes)
    vp = jax.tree.map(lambda p_: p_.astype(jnp.bfloat16)
                      if p_.dtype == jnp.float32 else p_, vp)
    dt = device_time(
        lambda zz: vae.apply({"params": vp}, zz, method=vae.decode),
        [z], max(4, it // 2),
    )
    print(f"VAE decode (b{b} 512^2): {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
