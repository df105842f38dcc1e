"""Per-op tally of the VAE decoder at the bench batch (b8, 512^2 out).

decode measures ~174ms while the conv FLOPs alone are ~51ms at peak —
this times every leaf-op family at its real decode shape and sums against
the whole, to find where the other ~120ms hides (GN bandwidth, nearest
resize lowering, the single-head 4096-token mid attention, the fp32
conv_out, or conv inefficiency at the 512^2/128^2 shapes).

  python scripts/vae_breakdown.py [--batch 8] [--iters 10]
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


def t(fn, args, iters, name, flops=None, count=1):
    dt = device_time(fn, args, iters)
    extra = f" ({flops / dt / 1e12:6.1f} TF/s {flops/dt/1e12/PEAK*100:4.0f}%)" if flops else ""
    tot = f"  x{count} = {dt * count * 1e3:7.2f} ms" if count > 1 else ""
    print(f"{name:<34s} {dt * 1e3:8.3f} ms{extra}{tot}", flush=True)
    return dt * count


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    b, it = args.batch, args.iters
    print(f"backend: {jax.default_backend()}  batch {b}", flush=True)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    total = 0.0

    # conv3x3 stages: (spatial, cin, cout, count)
    convs = [
        (64, 512, 512, 8),    # conv_in(4->512 approx as 512) + mid 2res(4) + up0 3res(6)... tallied as 8 eq
        (128, 512, 512, 7),   # up1 3 res (6 convs) + upsample conv
        (256, 512, 256, 1),   # up2 first res conv1 (in 512)
        (256, 256, 256, 6),   # up2 rest + upsample conv
        (512, 256, 128, 1),   # up3 first res conv1
        (512, 128, 128, 5),   # up3 rest
    ]
    for s, ci, co, n in convs:
        x = jnp.asarray(rng.randn(b, s, s, ci), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, ci, co) * 0.02, jnp.bfloat16)
        fl = 2 * b * s * s * 9 * ci * co
        total += t(lambda xx, ww: jax.lax.conv_general_dilated(
            xx, ww, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(xx.dtype),
            [x, w], it, f"conv3x3 {s}^2 {ci}->{co}", fl, n)

    # GroupNorm(+silu) per stage
    from distdiff_tpu.models.layers import GroupNorm
    for s, c, n in ((64, 512, 9), (128, 512, 6), (256, 256, 6), (512, 128, 7)):
        x = jnp.asarray(rng.randn(b, s, s, c), jnp.bfloat16)
        gn = GroupNorm(act="silu", dtype=jnp.bfloat16)
        gp = gn.init(key, x)
        total += t(lambda xx, gp=gp, gn=gn: gn.apply(gp, xx), [x], it,
                   f"gn+silu {s}^2 x{c}", None, n)

    # nearest upsample resizes
    for s, c in ((64, 512), (128, 512), (256, 256)):
        x = jnp.asarray(rng.randn(b, s, s, c), jnp.bfloat16)
        total += t(lambda xx: jax.image.resize(
            xx, (b, xx.shape[1] * 2, xx.shape[2] * 2, xx.shape[3]), "nearest"),
            [x], it, f"resize2x {s}->{2*s} x{c}")

    # mid attention (single head, c512, T4096) through the real module
    from distdiff_tpu.models.vae import VAEAttention
    x = jnp.asarray(rng.randn(b, 64, 64, 512), jnp.bfloat16)
    va = VAEAttention(dtype=jnp.bfloat16)
    vp = va.init(key, x)
    fl = 4 * 2 * b * 4096 * 512 * 512 + 2 * 2 * b * 4096 * 4096 * 512
    total += t(lambda xx: va.apply(vp, xx), [x], it, "mid_attn 64^2 c512", fl)

    # fp32 conv_out 128->3 at 512^2
    x = jnp.asarray(rng.randn(b, 512, 512, 128), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 128, 3) * 0.02, jnp.float32)
    fl = 2 * b * 512 * 512 * 9 * 128 * 3
    total += t(lambda xx, ww: jax.lax.conv_general_dilated(
        xx, ww, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")),
        [x, w], it, "conv_out fp32 512^2 128->3", fl)
    # same in bf16 for comparison
    total_bf = t(lambda xx, ww: jax.lax.conv_general_dilated(
        xx.astype(jnp.bfloat16), ww.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32),
        [x, w], it, "conv_out bf16 512^2 128->3", fl)

    print(f"--- tallied decode estimate: {total*1e3:7.1f} ms", flush=True)

    # the real decode
    from distdiff_tpu.config import PipelineConfig
    from distdiff_tpu.models import AutoencoderKL
    cfg = PipelineConfig.sd15()
    vae = AutoencoderKL(cfg.vae)
    z = jnp.asarray(rng.randn(b, 64, 64, 4), jnp.float32)
    shapes = jax.eval_shape(vae.init, key, jnp.zeros((1, 512, 512, 3)))["params"]
    vp2 = jax.tree.map(lambda s_: jnp.full(s_.shape, 0.02,
                                           jnp.bfloat16 if s_.dtype == jnp.float32
                                           else s_.dtype), shapes)
    dt = device_time(
        lambda zz: vae.apply({"params": vp2}, zz, method=vae.decode),
        [z], max(4, it // 2))
    print(f"real decode (b{b}): {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
