"""Time the transform_guidance update under both rollout remat policies.

The guide dispatch is 1.87s of the 5.75s bench batch (scripts/
pipeline_breakdown.py). With "step" remat the backward recomputes each
rollout forward twice (outer jax.checkpoint + inner nn.remat); "block"
drops the outer checkpoint — ~1 forward less recompute per step IF the
step-boundary tensors fit HBM at batch 8.

  python scripts/guide_probe.py [--batch 8] [--iters 3]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--modes", default="step,block")
    args = p.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)

    import bench as bench_mod
    from distdiff_tpu.guidance.optimize import transform_guidance
    from distdiff_tpu.sampling.pipeline import cast_params_bf16

    pipe, bench_args = bench_mod.build("sd15", args.batch)
    params, lat0, cond, uncond, targets, keys = bench_args
    params = cast_params_bf16(pipe.full_params())
    g0 = 30

    for mode in args.modes.split(","):
        gcfg = dataclasses.replace(pipe.guidance_cfg, rollout_remat=mode)
        pipe.guidance_cfg = gcfg
        ctx = pipe.guidance_context()

        @jax.jit
        def guide(params, x, keys):
            out, _ = transform_guidance(
                ctx, params, x, cond, uncond, targets, keys, g0,
            )
            return out

        try:
            t0 = time.time()
            out = guide(params, lat0, keys)
            jax.block_until_ready(out)
            print(f"{mode}: compile+first {time.time()-t0:.1f}s", flush=True)
            ts = []
            for i in range(args.iters):
                x = lat0 + jnp.float32(1e-6 * (i + 1))
                jax.block_until_ready(x)
                t0 = time.time()
                jax.block_until_ready(guide(params, x, keys))
                ts.append(time.time() - t0)
            print(f"{mode}: guide {min(ts)*1e3:8.1f} ms", flush=True)
        except Exception as e:  # OOM expected for "block" if HBM too small
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
