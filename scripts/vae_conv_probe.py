"""Probe alternative lowerings for the VAE-decoder 512^2 convs (CLAUDE.md
round-3 lead: conv 512^2x128 measures ~64% MXU vs 86-100% at sibling
shapes — an XLA lowering artifact worth one experiment).

Variants per stage (b8 decode shapes):
  xla      : lax conv NHWC SAME (current path)
  s2b      : space-to-batch — split H into 4 stripes with 1-px halo,
             conv [4B, H/4+2, W, C] VALID-in-H, crop-free concat.  Same
             real FLOPs + halo overhead; tests whether smaller spatial
             extents tile better on the MXU.
  s2b_w    : the same split along W.
  dot9     : nine shifted matmuls (explicit im2col-free formulation).
  b_fold   : fold batch 2x by splitting H in half WITHOUT halo (cost
             model only — wrong at the seam; measures pure tiling gain).

  python scripts/vae_conv_probe.py [--iters 10] [--batch 8]
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


def conv(x, w, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def s2b_h(x, w, splits=4):
    b, h, wd, c = x.shape
    hs = h // splits
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    tiles = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, i * hs, hs + 2, axis=1)
         for i in range(splits)], 0,
    )  # [S, B, hs+2, W, C]
    tiles = tiles.reshape(splits * b, hs + 2, wd, c)
    y = conv(tiles, w, padding=((0, 0), (1, 1)))  # VALID in H, SAME in W
    y = y.reshape(splits, b, hs, wd, c)
    return jnp.concatenate([y[i] for i in range(splits)], axis=1)


def s2b_w(x, w, splits=4):
    return jnp.transpose(
        s2b_h(jnp.transpose(x, (0, 2, 1, 3)), jnp.transpose(w, (1, 0, 2, 3)),
              splits),
        (0, 2, 1, 3),
    )


def dot9(x, w):
    b, h, wd, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, wd, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + jnp.einsum(
                "bhwc,cd->bhwd", xp[:, dy:dy + h, dx:dx + wd, :], w[dy, dx],
                preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def b_fold(x, w):
    b, h, wd, c = x.shape
    return conv(x.reshape(b * 2, h // 2, wd, c), w)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()
    b, it = args.batch, args.iters
    print(f"backend: {jax.default_backend()}  batch {b}", flush=True)
    rng = np.random.RandomState(0)

    for s, c in ((512, 128), (256, 256), (128, 512)):
        x = jnp.asarray(rng.randn(b, s, s, c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
        flops = 2 * b * s * s * 9 * c * c
        line = f"{s}^2x{c:<4}"
        for name, fn in (("xla", conv), ("s2b", s2b_h), ("s2b_w", s2b_w),
                         ("dot9", dot9), ("b_fold", b_fold)):
            try:
                t = device_time(fn, [x, w], it)
                line += f" | {name} {t*1e3:7.3f}ms ({flops/t/1e12/PEAK*100:4.0f}%)"
            except Exception as e:
                line += f" | {name} FAIL({type(e).__name__})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
