"""Probe conv formulations at the SD UNet hot shapes on the real TPU.

Round-1 finding: XLA's 3x3 conv at 64^2 x 320 runs ~48% MXU and sets the
pipeline ceiling (CLAUDE.md). This measures, per stage shape (CFG batch 16 =
bench batch 8 x 2):
  * xla_conv   — lax.conv_general_dilated NHWC (the current path)
  * dot9       — 3x3 conv as 9 shifted [BHW, C] @ [C, Co] matmuls
  * im2col     — patches -> one [BHW, 9C] @ [9C, Co] matmul
  * pad128     — xla conv with channels padded up to a multiple of 128
  * conv1x1 vs dot for the projection shapes
Timing: slope method with FULL-output liveness (scripts/kernel_bench).

  python scripts/conv_probe.py [--iters 16] [--batch 16]
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

PEAK_TFS = 197.0  # v5e bf16


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def dot9(x, w):
    b, h, wd, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, wd, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + jnp.einsum(
                "bhwc,cd->bhwd", xp[:, dy:dy + h, dx:dx + wd, :], w[dy, dx],
                preferred_element_type=jnp.float32,
            )
    return acc.astype(x.dtype)


def im2col(x, w):
    b, h, wd, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + wd, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )  # [B,H,W,9C]
    out = jnp.einsum("bhwk,kd->bhwd", cols, w.reshape(9 * c, co),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def pad_to(v, m=128):
    return (v + m - 1) // m * m


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--batch", type=int, default=16)
    args = p.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    b = args.batch

    stages = [
        (64, 320), (32, 640), (16, 1280), (8, 1280),
    ]
    for s, c in stages:
        x = jnp.asarray(rng.randn(b, s, s, c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
        flops = 2 * b * s * s * 9 * c * c
        res = {}
        for name, fn in (("xla_conv", xla_conv), ("dot9", dot9),
                         ("im2col", im2col)):
            it = args.iters
            t = device_time(fn, [x, w], it)
            res[name] = t
        cp = pad_to(c)
        if cp != c:
            xpad = jnp.asarray(rng.randn(b, s, s, cp), jnp.bfloat16)
            wpad = jnp.asarray(rng.randn(3, 3, cp, cp) * 0.05, jnp.bfloat16)
            tp = device_time(xla_conv, [xpad, wpad], args.iters)
            res[f"pad{cp}"] = tp
        line = f"{s:>3}^2 x{c:<5}"
        for name, t in res.items():
            eff = flops / t / 1e12 / PEAK_TFS * 100
            # pad variant does more real FLOPs; report its own efficiency too
            if name.startswith("pad"):
                cp2 = int(name[3:])
                feff = 2 * b * s * s * 9 * cp2 * cp2 / t / 1e12 / PEAK_TFS * 100
                line += f" | {name} {t*1e6:7.0f}us ({eff:4.0f}% net, {feff:4.0f}% raw)"
            else:
                line += f" | {name} {t*1e6:7.0f}us ({eff:4.0f}%)"
        print(line, flush=True)

    # 1x1 projections (proj_in/out at the attention stages)
    for s, c in ((64, 320), (32, 640), (16, 1280)):
        x = jnp.asarray(rng.randn(b, s, s, c), jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(1, 1, c, c) * 0.05, jnp.bfloat16)
        wd = jnp.asarray(rng.randn(c, c) * 0.05, jnp.bfloat16)
        flops = 2 * b * s * s * c * c
        t_conv = device_time(xla_conv, [x, w1], args.iters)
        t_dot = device_time(
            lambda xx, ww: jnp.einsum("bhwc,cd->bhwd", xx, ww,
                                      preferred_element_type=jnp.float32
                                      ).astype(xx.dtype),
            [x, wd], args.iters,
        )
        print(
            f"1x1 {s:>3}^2 x{c:<5} | conv {t_conv*1e6:7.0f}us "
            f"({flops/t_conv/1e12/PEAK_TFS*100:4.0f}%) | dot {t_dot*1e6:7.0f}us "
            f"({flops/t_dot/1e12/PEAK_TFS*100:4.0f}%)",
            flush=True,
        )


if __name__ == "__main__":
    main()
