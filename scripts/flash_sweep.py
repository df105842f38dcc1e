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
    rng = np.random.RandomState(0)
    b, t, h, d = 2, 4096, 8, 40
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    flops = 2 * b * h * t * t * d * 2

    results = []
    for bq, bk in [(256, 2048), (512, 2048), (256, 4096), (512, 4096),
                   (128, 4096), (1024, 2048)]:
        os.environ["DISTDIFF_FLASH_BQ"] = str(bq)
        os.environ["DISTDIFF_FLASH_BK"] = str(bk)
        import distdiff_tpu.ops.flash as flash

        importlib.reload(flash)
        try:
            dt = device_time(flash.flash_attention, [q, k, v], 16)
        except Exception as e:
            print(f"bq={bq} bk={bk}: FAILED {type(e).__name__}", flush=True)
            continue
        print(f"bq={bq:5d} bk={bk:5d}: {dt * 1e3:7.3f} ms "
              f"({flops / dt / 1e12:5.1f} TF/s eff)", flush=True)
        results.append((dt, bq, bk))
    if results:
        dt, bq, bk = min(results)
        print(f"BEST: bq={bq} bk={bk} @ {dt * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
