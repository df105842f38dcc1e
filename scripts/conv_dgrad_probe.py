"""Probe XLA's conv *dgrad* lowering vs a hand-written flipped-weight conv.

Motivation (CLAUDE.md guide-leg ground truth): the guidance backward
differentiates w.r.t. LATENTS only, so conv backward needs just dgrad
(no wgrad).  UNet CFG-16 fwd+dgrad measures 433ms vs a 2x-fwd floor of
~304ms — if XLA lowers the transpose-of-conv slower than the forward
conv, a custom VJP expressing dgrad as a plain SAME conv with spatially
flipped, IO-transposed weights recovers that gap for free.

For stride-1 SAME odd-kernel convs the identity is exact:
    dgrad(dy) = conv(dy, flip_hw(w).swap(I,O))

Variants per shape:
  fwd   : the forward conv (reference point)
  ad    : jax.linear_transpose of the conv in x, applied to dy — exactly
          the op the guidance backward dispatches today
  flip  : the equivalent plain conv with flipped/transposed weights

Run: python scripts/conv_dgrad_probe.py [--iters 10]

VERDICT (v5e, 2026-08-18): the direction is CLOSED — XLA's native dgrad
(`ad`) runs at forward-conv speed at every real shape:
  b16 64^2x320: fwd 76% / ad 69% / flip 67%   (UNet level 0)
  b16 32^2x640: fwd 99% / ad 110% / flip 89%  (UNet level 1)
  b8 512^2x128: fwd 64% / ad 65% / flip 67%   (VAE decode top)
  b8 256^2x256: fwd 77% / ad 86% / flip 77%
A custom flipped-weight VJP buys nothing; the guide leg's fwd+dgrad 433ms
vs 2x-fwd 304ms "slack" is attention's inherent ~2.5x-fwd backward flops
(5 dots + recompute), already measured at 87% of its padded floor.
(The b16 16^2x1280 row is unstable across runs — 16-90% for the SAME
geometry depending on operand layout; in-context resnets measure
134-226 TF/s (scripts/unet_breakdown16.py), so it is a standalone-probe
layout artifact, not a model-path problem.)
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


def conv(x, w):
    # pure-dtype conv, matching flax nn.Conv(dtype=bf16) on the hot path
    # (a preferred_element_type=f32 + cast breaks the VJP transpose with a
    # dtype mismatch and is NOT what the models run)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def dgrad_ad(dy, x, w):
    _, vjp = jax.vjp(lambda xi: conv(xi, w), x)
    return vjp(dy)[0]


def dgrad_flip(dy, w):
    wf = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    return conv(dy, wf)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    it = args.iters
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)

    # numerical check on a small shape (fp32 to keep the check tight)
    x32 = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
    w32 = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    dy32 = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
    a = jax.jit(dgrad_ad)(dy32, x32, w32)
    f = jax.jit(dgrad_flip)(dy32, w32)
    err = float(jnp.max(jnp.abs(a - f)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"flip-vs-ad rel err: {err:.2e}", flush=True)

    # (batch, spatial, channels): UNet CFG-16 levels + VAE b8 decode stages
    shapes = [
        (16, 64, 320), (16, 32, 640), (16, 16, 1280), (16, 8, 1280),
        (8, 512, 128), (8, 256, 256), (8, 128, 512),
    ]
    for b, s, c in shapes:
        x = jnp.asarray(rng.randn(b, s, s, c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.bfloat16)
        dy = jnp.asarray(rng.randn(b, s, s, c), jnp.bfloat16)
        flops = 2 * b * s * s * 9 * c * c
        line = f"b{b} {s}^2x{c:<4}"
        for name, fn, fargs in (
            ("fwd", conv, [x, w]),
            ("ad", dgrad_ad, [dy, x, w]),
            ("flip", dgrad_flip, [dy, w]),
        ):
            try:
                t = device_time(fn, fargs, it)
                line += f" | {name} {t*1e3:7.3f}ms ({flops/t/1e12/PEAK*100:4.0f}%)"
            except Exception as e:
                line += f" | {name} FAIL({type(e).__name__})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
