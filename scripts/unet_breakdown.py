"""Slope-time individual UNet building blocks at SD-1.5 shapes (batch 2).

  python scripts/unet_breakdown.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scripts.kernel_bench import device_time
from distdiff_tpu.models.layers import (
    GroupNorm, ResnetBlock, SpatialTransformer,
)


def t(fn, x, iters=30, name="", flops=None):
    dt = device_time(fn, [x], iters)
    extra = f" ({flops / dt / 1e12:5.1f} TF/s)" if flops else ""
    print(f"{name:<46s} {dt * 1e3:8.3f} ms{extra}", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    print("batch 2 (CFG), bf16", flush=True)

    for (hw, c) in [(64, 320), (32, 640), (16, 1280), (8, 1280)]:
        x = jnp.asarray(rng.randn(2, hw, hw, c), jnp.bfloat16)
        conv = nn.Conv(c, (3, 3), padding=1, dtype=jnp.bfloat16)
        cp = conv.init(jax.random.PRNGKey(0), x)
        flops = 2 * 2 * hw * hw * c * c * 9
        t(lambda xx, cp=cp, conv=conv: conv.apply(cp, xx), x,
          name=f"conv3x3 {hw}x{hw}x{c}", flops=flops)

        gn = GroupNorm(dtype=jnp.bfloat16)
        gp = gn.init(jax.random.PRNGKey(0), x)
        t(lambda xx, gp=gp, gn=gn: gn.apply(gp, xx), x,
          name=f"groupnorm {hw}x{hw}x{c}")

        rb = ResnetBlock(c, use_time_emb=False, dtype=jnp.bfloat16)
        rp = rb.init(jax.random.PRNGKey(0), x)
        t(lambda xx, rp=rp, rb=rb: rb.apply(rp, xx), x,
          name=f"resblock {hw}x{hw}x{c}",
          flops=2 * flops)

    # transformer block at 64^2 (heads 8, dim 40)
    for (hw, c, heads) in [(64, 320, 8), (32, 640, 8)]:
        x = jnp.asarray(rng.randn(2, hw, hw, c), jnp.bfloat16)
        ctx = jnp.asarray(rng.randn(2, 77, 768), jnp.bfloat16)
        st = SpatialTransformer(num_heads=heads, head_dim=c // heads,
                                dtype=jnp.bfloat16)
        sp = st.init(jax.random.PRNGKey(0), x, ctx)
        t(lambda xx, sp=sp, st=st, ctx=ctx: st.apply(sp, xx, ctx), x,
          name=f"spatial-transformer {hw}x{hw}x{c}")


if __name__ == "__main__":
    main()
