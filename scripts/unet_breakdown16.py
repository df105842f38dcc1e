"""Component tally of the UNet step at the REAL bench batch (CFG-16).

Times the full UNet forward and its building blocks at b16, then sums the
blocks against the whole — the gap is what's unaccounted (fusion overheads,
layout copies). Also compares Pallas flash vs XLA attention at b16 and the
attention prep/unprep (transpose+pad) cost.

  python scripts/unet_breakdown16.py [--batch 16] [--iters 12]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from scripts.kernel_bench import device_time


def t(fn, args, iters, name, flops=None, count=1):
    dt = device_time(fn, args, iters)
    extra = f" ({flops / dt / 1e12:6.1f} TF/s)" if flops else ""
    tot = f"  x{count} = {dt * count * 1e3:7.2f} ms" if count > 1 else ""
    print(f"{name:<42s} {dt * 1e3:8.3f} ms{extra}{tot}", flush=True)
    return dt * count


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=12)
    args = p.parse_args()
    b = args.batch
    it = args.iters
    rng = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}  batch {b} bf16", flush=True)

    from distdiff_tpu.config import PipelineConfig
    from distdiff_tpu.models import UNet2DCondition
    from distdiff_tpu.models.layers import (
        GroupNorm, ResnetBlock, SpatialTransformer,
    )
    from distdiff_tpu.ops.attention import xla_attention
    from distdiff_tpu.ops.flash import flash_attention
    from distdiff_tpu.sampling.pipeline import cast_params_bf16, init_params_lazy

    # ---- whole UNet forward. NOTE: device_time wraps the op in a scan;
    # the remote compile service takes pathologically long on a scan-of-
    # full-UNet program (>90 min observed) — default OFF; the per-step time
    # from scripts/pipeline_breakdown.py measures the same thing.
    total = None
    if os.environ.get("DISTDIFF_BD16_FULL"):
        cfg = PipelineConfig.sd15()
        unet = UNet2DCondition(cfg.unet)
        lat = jnp.asarray(rng.randn(b, 64, 64, 4), jnp.float32)
        ctx = jnp.asarray(rng.randn(b, 77, 768), jnp.float32)
        shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(0), lat,
                                jnp.array([1]), ctx)["params"]
        up = cast_params_bf16(
            jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), shapes))
        total = t(lambda x: unet.apply({"params": up}, x, jnp.asarray(501),
                                       ctx), [lat], it, f"UNet fwd (b{b})")

    # ---- attention: flash vs XLA at each self shape + prep overhead
    acc = 0.0
    for (tq, heads, d, n_layers) in [(4096, 8, 40, 5), (1024, 8, 80, 5),
                                     (256, 8, 160, 5), (64, 8, 160, 1)]:
        q = jnp.asarray(rng.randn(b, tq, heads, d), jnp.bfloat16)
        flops = 2 * 2 * b * heads * tq * tq * d
        dt_f = t(flash_attention, [q, q, q], it,
                 f"flash self T{tq} d{d}", flops=flops, count=n_layers)
        if tq * tq <= 4096 * 4096 and b * heads * tq * tq * 4 < 6e9:
            t(xla_attention, [q, q, q], it, f"xla   self T{tq} d{d}",
              flops=flops, count=n_layers)
        acc += dt_f
    # cross-attention (77 kv tokens)
    for (tq, heads, d, n_layers) in [(4096, 8, 40, 5), (1024, 8, 80, 5),
                                     (256, 8, 160, 5), (64, 8, 160, 1)]:
        q = jnp.asarray(rng.randn(b, tq, heads, d), jnp.bfloat16)
        kv = jnp.asarray(rng.randn(b, 77, heads, d), jnp.bfloat16)
        flops = 2 * 2 * b * heads * tq * 77 * d
        acc += t(flash_attention, [q, kv, kv], it,
                 f"flash cross T{tq} d{d}", flops=flops, count=n_layers)
    print(f"attention subtotal: {acc*1e3:8.2f} ms", flush=True)

    # ---- conv/resnet/transformer tallies per stage
    sub = acc
    stage_counts = {
        # (hw, c): (n_res_same, n_res_wider_in, n_transformer)
        (64, 320): (3, 3, 5),
        (32, 640): (3, 3, 5),
        (16, 1280): (3, 3, 5),
        (8, 1280): (6, 1, 1),
    }
    for (hw, c), (n_same, n_wide, n_st) in stage_counts.items():
        x = jnp.asarray(rng.randn(b, hw, hw, c), jnp.bfloat16)
        temb = jnp.asarray(rng.randn(b, 1280), jnp.bfloat16)
        rb = ResnetBlock(c, dtype=jnp.bfloat16)
        rp = rb.init(jax.random.PRNGKey(0), x, temb)
        rflops = 2 * b * hw * hw * 9 * c * c * 2
        sub += t(lambda xx, tt: rb.apply(rp, xx, tt), [x, temb], it,
                 f"resblock {hw}^2x{c}", flops=rflops, count=n_same)
        xw = jnp.asarray(rng.randn(b, hw, hw, 2 * c), jnp.bfloat16)
        rbw = ResnetBlock(c, dtype=jnp.bfloat16)
        rpw = rbw.init(jax.random.PRNGKey(0), xw, temb)
        wflops = 2 * b * hw * hw * 9 * (2 * c * c + c * c) + 2 * b * hw * hw * 2 * c * c
        sub += t(lambda xx, tt: rbw.apply(rpw, xx, tt), [xw, temb], it,
                 f"resblock {hw}^2 {2*c}->{c}", flops=wflops, count=n_wide)
        if n_st:
            heads = 8
            st = SpatialTransformer(num_heads=heads, head_dim=c // heads,
                                    dtype=jnp.bfloat16)
            ctx77 = jnp.asarray(rng.randn(b, 77, 768), jnp.bfloat16)
            sp = st.init(jax.random.PRNGKey(0), x, ctx77)
            stt = t(lambda xx: st.apply(sp, xx, ctx77), [x], it,
                    f"spatial-transformer {hw}^2x{c}", count=n_st)
            # transformer includes its own attention; avoid double counting:
            # subtract the flash self+cross we already added for this stage
            sub += stt
    print(f"--- components (attention counted once inside transformers; the\n"
          f"    standalone attention rows above are diagnostics, not added)",
          flush=True)
    comp = sub - acc  # resnets + transformers only
    ref = f"vs UNet fwd {total*1e3:8.2f} ms " if total else \
        "(compare against the ~ms/step from scripts/pipeline_breakdown.py) "
    print(f"resnet+transformer subtotal: {comp*1e3:8.2f} ms {ref}"
          f"(gap = conv_in/out, up/down-sample, time-emb, residual adds, "
          f"skip concats, layout copies)", flush=True)


if __name__ == "__main__":
    main()
