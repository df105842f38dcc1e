"""Softmax-variant timing sweep for the flash kernels at the bench shape.

The r3 leads (CLAUDE.md): the [bq, bk] exp + max/sum VPU work is a large
slice of self-attention at T4096 d40. Variants (module flags, read at
import — hence the reload-per-config):

  matl  — row-sum l via an appended ones column in the p@v MXU dot
  nomax — constant-shift softmax (no row max pass, no online rescale)
  bf16p — exp computed on bf16

Measures forward AND forward+backward (the guidance path) per combo.
"""

from __future__ import annotations

import importlib
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.kernel_bench import device_time


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--seq", type=int, default=4096)
    p.add_argument("--dim", type=int, default=40)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    b, t, h, d = args.batch, args.seq, 8, args.dim
    q = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    w = jnp.asarray(rng.randn(b, t, h, d), jnp.bfloat16)
    flops = 2 * b * h * t * t * d * 2

    combos = [
        ("baseline(r2)", {"MATL": "0", "NOMAX": "0", "BF16P": "0"}),
        ("matl", {"MATL": "1", "NOMAX": "0", "BF16P": "0"}),
        ("matl+nomax", {"MATL": "1", "NOMAX": "1", "BF16P": "0"}),
        ("matl+bf16p", {"MATL": "1", "NOMAX": "0", "BF16P": "1"}),
        ("all", {"MATL": "1", "NOMAX": "1", "BF16P": "1"}),
    ]
    results = []
    for name, flags in combos:
        for kk, vv in flags.items():
            os.environ[f"DISTDIFF_FLASH_{kk}"] = vv
        import distdiff_tpu.ops.flash as flash

        importlib.reload(flash)

        def fwd(qq):
            return flash.flash_attention(qq, k, v)

        def fwdbwd(qq):
            return jax.grad(
                lambda a, b_, c: jnp.sum(
                    flash.flash_attention(a, b_, c).astype(jnp.float32)
                    * w.astype(jnp.float32)),
                argnums=(0, 1, 2))(qq, k, v)

        try:
            tf = device_time(fwd, [q], args.iters)
            tb = device_time(fwdbwd, [q], max(4, args.iters // 2))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(f"{name:<14s} fwd {tf * 1e3:7.3f} ms ({flops / tf / 1e12:5.1f} "
              f"TF/s eff) | fwd+bwd {tb * 1e3:7.3f} ms", flush=True)
        results.append((tf, tb, name))
    if results:
        best_f = min(results)
        best_b = min(results, key=lambda r: r[1])
        print(f"BEST fwd: {best_f[2]} @ {best_f[0] * 1e3:.3f} ms; "
              f"BEST fwd+bwd: {best_b[2]} @ {best_b[1] * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
