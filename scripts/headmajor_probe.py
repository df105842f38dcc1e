"""Probe: head-major qkv projections vs Dense+transpose at the bench shapes.

The flash path today does ``Dense -> [B,T,H,D] -> transpose -> [BH,T,D]``
per tensor (4 relayouts of ~42MB each at CFG-16 T4096).  If XLA can emit
``einsum('btc,chd->bhtd')`` with the transpose folded into the dot's output
layout, the relayouts disappear.  This times, at (b16, T4096, C320, H8 D40)
and the other stages:

  dense_t   : x @ W  -> reshape -> transpose(0,2,1,3) -> reshape [BH,T,D]
  einsum_hm : einsum btc,chd->bhtd -> reshape [BH,T,D]
  out_t     : transpose back + to_out dense     (the unprep side)
  out_hm    : einsum bhtd,hdc->btc              (fused unprep)

  python scripts/headmajor_probe.py [--iters 16]
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

from scripts.kernel_bench import device_time

PEAK = 197.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args()
    it = args.iters
    b = args.batch
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)

    # (T, C, H, D) per transformer stage; D stays 40/80/160 per SD-1.5
    stages = [(4096, 320, 8, 40), (1024, 640, 8, 80), (256, 1280, 8, 160)]
    for t_, c, h, d in stages:
        x = jnp.asarray(rng.randn(b, t_, c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(c, h * d) * 0.02, jnp.bfloat16)
        whm = w.reshape(c, h, d)
        wo = jnp.asarray(rng.randn(h * d, c) * 0.02, jnp.bfloat16)
        wohm = wo.reshape(h, d, c)
        y3 = jnp.asarray(rng.randn(b * h, t_, d), jnp.bfloat16)
        flops = 2 * b * t_ * c * h * d

        def dense_t(xx, ww):
            q = (xx @ ww).reshape(b, t_, h, d)
            return jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, t_, d)

        def einsum_hm(xx, ww):
            q = jnp.einsum("btc,chd->bhtd", xx, ww)
            return q.reshape(b * h, t_, d)

        def out_t(yy, ww):
            q = yy.reshape(b, h, t_, d)
            q = jnp.transpose(q, (0, 2, 1, 3)).reshape(b, t_, h * d)
            return q @ ww

        def out_hm(yy, ww):
            return jnp.einsum("bhtd,hdc->btc", yy.reshape(b, h, t_, d), ww)

        r = {}
        r["dense_t"] = device_time(dense_t, [x, w], it)
        r["einsum_hm"] = device_time(einsum_hm, [x, whm], it)
        r["out_t"] = device_time(out_t, [y3, wo], it)
        r["out_hm"] = device_time(out_hm, [y3, wohm], it)
        line = f"T{t_:<5}C{c:<5}H{h}D{d:<4}"
        for k, v in r.items():
            line += f" | {k} {v*1e6:7.0f}us ({flops/v/1e12/PEAK*100:4.0f}%)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
