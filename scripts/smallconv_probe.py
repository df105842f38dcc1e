"""A/B the tiny-channel conv reformulations (ops/smallconv) vs XLA's
direct conv at every real call-site shape, plus the new broadcast
upsample vs jax.image.resize (fwd AND vjp).

  python scripts/smallconv_probe.py [--iters 12]
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
from distdiff_tpu.ops.smallconv import conv3x3_small_cin, conv3x3_small_cout


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(x.dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=12)
    args = p.parse_args()
    it = args.iters
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)

    # (tag, B, S, Ci, Co)
    sites = [
        ("vae_dec.conv_out", 8, 512, 128, 3),
        ("vae_enc.conv_out", 8, 64, 512, 8),
        ("vae_dec.conv_in ", 8, 64, 4, 512),
        ("vae_enc.conv_in ", 8, 512, 3, 128),
        ("unet.conv_out   ", 16, 64, 320, 4),
        ("unet.conv_in    ", 16, 64, 4, 320),
    ]
    for tag, b, s, ci, co in sites:
        x = jnp.asarray(rng.randn(b, s, s, ci), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, jnp.bfloat16)
        small = conv3x3_small_cout if co <= 16 else conv3x3_small_cin
        td = device_time(direct, [x, w], it)
        ts = device_time(small, [x, w], it)
        # vjp cost (input grads only, like the guidance backward)
        def vjp_d(xx, ww):
            return jax.grad(lambda a: direct(a, ww).sum())(xx)
        def vjp_s(xx, ww):
            return jax.grad(lambda a: small(a, ww).sum())(xx)
        tdg = device_time(vjp_d, [x, w], it)
        tsg = device_time(vjp_s, [x, w], it)
        print(f"{tag} fwd: direct {td*1e3:7.3f} ms  small {ts*1e3:7.3f} ms | "
              f"dx: direct {tdg*1e3:7.3f} ms  small {tsg*1e3:7.3f} ms",
              flush=True)

    # upsample variants (fwd + vjp)
    for s, c in ((128, 512), (256, 256)):
        b = 8
        x = jnp.asarray(rng.randn(b, s, s, c), jnp.bfloat16)

        def up_resize(xx):
            return jax.image.resize(
                xx, (b, s * 2, s * 2, c), method="nearest")

        def up_bcast(xx):
            return jnp.broadcast_to(
                xx[:, :, None, :, None, :], (b, s, 2, s, 2, c)
            ).reshape(b, s * 2, s * 2, c)

        tr = device_time(up_resize, [x], it)
        tb = device_time(up_bcast, [x], it)
        trg = device_time(lambda xx: jax.grad(
            lambda a: up_resize(a).sum())(xx), [x], it)
        tbg = device_time(lambda xx: jax.grad(
            lambda a: up_bcast(a).sum())(xx), [x], it)
        print(f"upsample {s}->{2*s} x{c}: resize {tr*1e3:7.3f} / bcast "
              f"{tb*1e3:7.3f} ms | vjp resize {trg*1e3:7.3f} / bcast "
              f"{tbg*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
