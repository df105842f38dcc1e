"""Sweep flash-attention block sizes on the hottest SD shape (slope-timed).

  python scripts/flash_sweep.py
"""

import importlib
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
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16,
                   help="CFG batch (bench default batch 8 -> CFG-16)")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--t", type=int, default=4096, help="sequence length")
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--d", type=int, default=40,
                   help="head dim (SD-1.5 64^2: 40; SDXL: 64)")
    args = p.parse_args()

    rng = np.random.RandomState(0)
    b, t, h, d = args.batch, args.t, args.heads, args.d
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    flops = 2 * b * h * t * t * d * 2

    results = []
    for pad_d in ("0", "1"):
        for bq, bk in [(512, 2048), (256, 2048), (512, 4096), (256, 4096),
                       (1024, 2048), (512, 1024)]:
            os.environ["DISTDIFF_FLASH_BQ"] = str(bq)
            os.environ["DISTDIFF_FLASH_BK"] = str(bk)
            os.environ["DISTDIFF_FLASH_PAD_D"] = pad_d
            import distdiff_tpu.ops.flash as flash

            importlib.reload(flash)
            try:
                dt = device_time(flash.flash_attention, [q, k, v], args.iters)
            except Exception as e:
                print(f"pad={pad_d} bq={bq} bk={bk}: FAILED "
                      f"{type(e).__name__}", flush=True)
                continue
            print(f"pad={pad_d} bq={bq:5d} bk={bk:5d}: {dt * 1e3:7.3f} ms "
                  f"({flops / dt / 1e12:5.1f} TF/s eff)", flush=True)
            results.append((dt, pad_d, bq, bk))
    if results:
        dt, pad_d, bq, bk = min(results)
        print(f"BEST: pad={pad_d} bq={bq} bk={bk} @ {dt * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
