"""Time each dispatch of the bench SplitExpand path separately on the TPU.

The bench (batch 8, SD-1.5 DDIM-50 512^2 guided) runs 3 dispatches:
  init_span   — img2img noising + denoise [25, 30)   (5 UNet steps, CFG-16)
  guide       — transform_guidance at step 30 (remat rollout fwd+bwd)
  span_decode — denoise [30, 50) (20 steps) + VAE decode (b8 512^2)
Where the 5.67s/batch actually goes decides the round-2 optimization order.

  python scripts/pipeline_breakdown.py [--batch 8] [--iters 3]
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
import numpy as np


def timed(fn, args_fn, iters):
    ts = []
    for i in range(iters):
        a = args_fn(i)
        jax.block_until_ready(a)
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--guide_chunk", type=int, default=8)
    args = p.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as bench_mod
    from distdiff_tpu.sampling.pipeline import cast_params_bf16

    pipe, bench_args = bench_mod.build("sd15", args.batch)
    params, lat0, cond, uncond, targets, keys = bench_args
    params = cast_params_bf16(params)
    chunk = args.guide_chunk if args.batch > args.guide_chunk else None
    se = pipe.make_split_expand(guide_chunk=chunk)
    print(f"start={se.start} g0={se.g0} g1={se.g1} n={se.n}", flush=True)

    # compile all three by one full call
    t0 = time.time()
    out = se(params, lat0, cond, uncond, targets, keys)
    jax.block_until_ready(out)
    print(f"compile+first-run: {time.time() - t0:.1f}s", flush=True)

    def vlat(i):
        return lat0 + jnp.float32(1e-6 * (i + 1))

    t_init, x = timed(
        lambda l: se.init_span(params, l, cond, uncond, keys, se.start, se.g0),
        lambda i: (vlat(i),), args.iters,
    )
    print(f"init_span [{se.start},{se.g0}) ({se.g0 - se.start} steps): "
          f"{t_init*1e3:8.1f} ms  ({t_init/(se.g0-se.start)*1e3:6.1f} ms/step)",
          flush=True)

    xs = x
    t_guide, xg = timed(
        lambda xx: se.guide(params, xx, cond, uncond, targets, keys),
        lambda i: (xs + jnp.float32(1e-6 * (i + 1)),), args.iters,
    )
    print(f"guide (transform, period 2, chunk {chunk}): {t_guide*1e3:8.1f} ms",
          flush=True)

    t_span, img = timed(
        lambda xx: se.span_decode(params, xx, cond, uncond, se.g0, se.n),
        lambda i: (xg + jnp.float32(1e-6 * (i + 1)),), args.iters,
    )
    n2 = se.n - se.g0
    print(f"span_decode [{se.g0},{se.n}) ({n2} steps) + VAE decode: "
          f"{t_span*1e3:8.1f} ms", flush=True)

    # decode alone (separate jit) to split span vs decode
    dec = jax.jit(lambda p, z: pipe.decode_latents(p, z))
    t_dec, _ = timed(
        lambda zz: dec(params, zz),
        lambda i: (xg + jnp.float32(1e-6 * (i + 1)),), args.iters,
    )
    print(f"VAE decode alone (b{args.batch} 512^2): {t_dec*1e3:8.1f} ms",
          flush=True)
    per_step = (t_span - t_dec) / n2
    print(f"=> denoise step (CFG-{2*args.batch}): ~{per_step*1e3:6.1f} ms",
          flush=True)
    total = t_init + t_guide + t_span
    print(f"total: {total:.3f}s/batch  ({args.batch/total:.3f} img/s/chip)",
          flush=True)


if __name__ == "__main__":
    main()
