"""On-device kernel timing that survives a high-latency tunnel: run N
iterations inside ONE compiled program (lax.scan with a data dependency so
nothing is CSE'd/elided), time the single dispatch, subtract nothing —
per-iteration time = total / N for N large enough that dispatch overhead
vanishes.

  python scripts/kernel_bench.py --what attention
  python scripts/kernel_bench.py --what unet --iters 20
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def device_time(fn, args, iters: int, perturb_index: int = 0):
    """Average per-call device time via a dispatch loop with ONE final sync.

    Executions queue serially on the chip, so total/iters ~= per-call time
    once iters is large enough to amortize the tunnel round trip. (A
    lax.scan-based harness is useless here: this runtime syncs per while-
    loop iteration, adding ~15-70ms per step.)
    """
    # The ONLY trustworthy timing on this tunnel: loop inside one compiled
    # program and take the SLOPE between two iteration counts (a host value
    # fetch forces the sync; constant overheads — RTT, warmup, constant
    # loads, even per-dispatch games — cancel in the difference).
    # block_until_ready does NOT reliably wait here, and the relay also
    # plays tricks with repeated dispatches.
    def make_run(n):
        # ALL args are jit ARGUMENTS: closed-over device arrays bake into
        # the HLO as constants, which (a) blows the remote compiler's
        # request-size limit for big param pytrees (HTTP 413) and (b) lets
        # XLA constant-fold weights — unrealistic for model-code timings.
        @jax.jit
        def run(a0, rest):
            def body(carry, _):
                acc, a = carry
                a2 = list(rest)
                a2[perturb_index] = a
                out = fn(*a2)
                # Fold the FULL output (every leaf, every column) back into
                # the perturbed input so iterations are sequentially
                # dependent AND nothing is dead. A [..., :1] summary lets
                # XLA DCE the unconsumed output columns of the timed op
                # (conv timings come out ~4x fast — see CLAUDE.md).
                s = sum(
                    jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree_util.tree_leaves(out)
                ) * 1e-20
                return (acc + s, a + s.astype(a.dtype)), None

            (acc, _), _ = jax.lax.scan(
                body, (jnp.float32(0.0), a0), None, length=n
            )
            return acc

        return run

    a0 = args[perturb_index]
    n1, n2 = max(2, iters // 5), iters
    run1, run2 = make_run(n1), make_run(n2)
    float(run1(a0, args)); float(run2(a0, args))  # compile both
    t1 = min(_timed(run1, a0, args) for _ in range(2))
    t2 = min(_timed(run2, a0, args) for _ in range(2))
    return max((t2 - t1) / (n2 - n1), 1e-9)


def _timed(run, a0, args):
    t0 = time.time()
    float(run(a0, args))
    return time.time() - t0


def bench_attention(iters: int):
    from distdiff_tpu.ops.attention import xla_attention
    from distdiff_tpu.ops.flash import flash_attention

    rng = np.random.RandomState(0)
    shapes = [
        (2, 4096, 4096, 8, 40, "self 64x64"),
        (2, 1024, 1024, 8, 80, "self 32x32"),
        (2, 256, 256, 8, 160, "self 16x16"),
        (2, 4096, 77, 8, 40, "cross 64x64"),
        (2, 1024, 77, 8, 80, "cross 32x32"),
        (2, 16384, 16384, 8, 64, "sdxl self 128x128"),
    ]
    for b, tq, tk, h, d, tag in shapes:
        q = jnp.asarray(rng.randn(b, tq, h, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, tk, h, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, tk, h, d), jnp.bfloat16)
        it = max(4, iters // 4) if tq >= 16384 else iters
        t_flash = device_time(flash_attention, [q, k, v], it)
        if tq * tk <= 4096 * 4096:  # xla materializes [B,H,Tq,Tk]; skip OOM
            t_xla = device_time(xla_attention, [q, k, v], it)
            xla_str = f"| xla {t_xla * 1e3:8.3f} ms"
        else:
            xla_str = "| xla (skipped: logits OOM)"
        flops = 2 * b * h * tq * tk * d * 2
        print(
            f"{tag:<20s} flash {t_flash * 1e3:8.3f} ms ({flops / t_flash / 1e12:6.1f} TF/s eff) "
            + xla_str,
            flush=True,
        )


def bench_unet(iters: int):
    from distdiff_tpu.config import PipelineConfig
    from distdiff_tpu.models import AutoencoderKL, UNet2DCondition
    from distdiff_tpu.models.text_encoder import CLIPTextEncoder
    from distdiff_tpu.sampling.pipeline import init_params_lazy

    cfg = PipelineConfig.sd15()
    unet = UNet2DCondition(cfg.unet)
    vae = AutoencoderKL(cfg.vae)
    te = CLIPTextEncoder(cfg.text_encoder)
    params = init_params_lazy(cfg, unet, vae, te)
    rng = np.random.RandomState(0)
    lat = jnp.asarray(rng.randn(2, 64, 64, 4), jnp.float32)
    ctx = jnp.asarray(rng.randn(2, 77, 768), jnp.float32)

    t = device_time(
        lambda x: unet.apply({"params": params["unet"]}, x, jnp.asarray(501), ctx),
        [lat], iters,
    )
    print(f"UNet fwd (CFG batch 2): {t * 1e3:8.2f} ms", flush=True)

    z = jnp.asarray(rng.randn(1, 64, 64, 4), jnp.float32)
    t = device_time(
        lambda zz: vae.apply({"params": params["vae"]}, zz, method=vae.decode),
        [z], max(4, iters // 2),
    )
    print(f"VAE decode 512^2 (b1):  {t * 1e3:8.2f} ms", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", choices=["attention", "unet", "all"], default="all")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    print(f"backend: {jax.default_backend()}", flush=True)
    if args.what in ("attention", "all"):
        bench_attention(args.iters)
    if args.what in ("unet", "all"):
        bench_unet(args.iters)


if __name__ == "__main__":
    main()
