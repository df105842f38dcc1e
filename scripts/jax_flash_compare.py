"""Compare our flash kernel vs jax's builtin TPU flash attention at the SD
hot shape (CFG-16, T4096, 8 heads, d40), fwd and bwd.

  python scripts/jax_flash_compare.py [--batch 16]
"""

import argparse
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.kernel_bench import device_time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=12)
    args = p.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)

    from distdiff_tpu.ops.flash import flash_attention as ours
    from jax.experimental.pallas.ops.tpu import flash_attention as jfa

    rng = np.random.RandomState(0)
    for (t, h, d) in [(4096, 8, 40), (1024, 8, 80)]:
        b = args.batch
        q = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)   # ours: BTHD
        qj = jnp.transpose(q, (0, 2, 1, 3))                     # jax: BHTD
        flops = 4 * b * h * t * t * d

        theirs = functools.partial(
            jfa.flash_attention, causal=False, sm_scale=1.0 / np.sqrt(d),
        )
        for name, fn, arg in (("ours", ours, q), ("jax", theirs, qj)):
            try:
                dt = device_time(lambda x, f=fn: f(x, x, x), [arg], args.iters)
                print(f"{name} fwd T{t} d{d}: {dt*1e3:7.3f} ms "
                      f"({flops/dt/1e12:5.1f} TF/s)", flush=True)
            except Exception as e:
                print(f"{name} fwd T{t} d{d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

        def loss_ours(x):
            return ours(x, x, x).astype(jnp.float32).sum()

        def loss_jax(x):
            return theirs(x, x, x).astype(jnp.float32).sum()

        for name, loss, arg in (("ours", loss_ours, q), ("jax", loss_jax, qj)):
            try:
                g = jax.grad(loss)
                dt = device_time(g, [arg], max(4, args.iters // 2))
                print(f"{name} bwd T{t} d{d}: {dt*1e3:7.3f} ms", flush=True)
            except Exception as e:
                print(f"{name} bwd T{t} d{d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
