"""Sweep the flash-attention BACKWARD block caps at the CFG-16 self shape.

The guide backward spends ~170-210ms/step in transformer bwd; the fused
bwd kernel's padded-flops floor at (16,8,4096,40) is 5 dots x 5.5e11 =
2.75e12 FLOP -> ~14ms/layer at the v5e's 197 TF/s. This sweeps
DISTDIFF_FLASH_BQ_BWD / BK_BWD (trace-time baked, so each setting gets a
fresh jit) and the fused-vs-split dispatch to find the bwd's distance to
that floor.

  python scripts/flash_bwd_sweep.py [--iters 10]
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

from scripts.kernel_bench import device_time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--shape", default="16,4096,8,40")
    p.add_argument("--caps", default="512:2048,512:4096,1024:2048,256:2048,"
                   "512:1024,1024:4096,2048:2048")
    args = p.parse_args()
    b, t, h, d = map(int, args.shape.split(","))
    print(f"backend: {jax.default_backend()}  shape b{b} t{t} h{h} d{d}",
          flush=True)

    from distdiff_tpu.ops import flash

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, t, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, h, t, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, h, t, d), jnp.bfloat16)

    # padded-flops floor: fused bwd = 5 dots over [t, t] x d_pad(128)
    flops = 5 * 2 * b * h * t * t * 128
    print(f"padded bwd floor @197TF/s: {flops / 197e12 * 1e3:.2f} ms",
          flush=True)

    for cap in args.caps.split(","):
        bq_cap, bk_cap = cap.split(":")
        os.environ["DISTDIFF_FLASH_BQ_BWD"] = bq_cap
        os.environ["DISTDIFF_FLASH_BK_BWD"] = bk_cap

        def loss(q, k, v):
            return jnp.sum(
                flash.flash_attention_hm(q, k, v).astype(jnp.float32)
            )

        g = jax.grad(loss, argnums=(0, 1, 2))
        try:
            t0 = time.time()
            ms = device_time(lambda q: g(q, k, v), [q], args.iters) * 1e3
            print(f"bq_bwd={bq_cap:>5} bk_bwd={bk_cap:>5}  "
                  f"{ms:8.3f} ms  (compile+meas {time.time()-t0:5.1f}s)",
                  flush=True)
        except Exception as e:
            print(f"bq_bwd={bq_cap:>5} bk_bwd={bk_cap:>5}  FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
