"""Component tally of the SDXL-base UNet step at the bench batch (CFG-2).

SDXL geometry (config.UNetConfig.sdxl_base): 3 levels (320/640/1280), no
attention at 128^2, transformer depth 2 at 64^2 (5 modules) and depth 10
at 32^2 (6 modules incl. mid), head_dim 64, 2048-d context. The bench
runs batch 1 => CFG-2 through the UNet.

Times resblocks, whole spatial-transformer modules, and the raw attention
shapes (flash vs XLA) so SDXL tuning targets the real hotspot instead of
guessing from SD-1.5 numbers.

  python scripts/sdxl_breakdown.py [--batch 2] [--iters 12]
"""

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


def t(fn, args, iters, name, flops=None, count=1, perturb_index=0):
    dt = device_time(fn, args, iters, perturb_index=perturb_index)
    extra = f" ({flops / dt / 1e12:6.1f} TF/s, {flops/dt/1e12/PEAK*100:3.0f}%)" if flops else ""
    tot = f"  x{count} = {dt * count * 1e3:7.2f} ms" if count > 1 else ""
    print(f"{name:<44s} {dt * 1e3:8.3f} ms{extra}{tot}", flush=True)
    return dt * count


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2, help="CFG batch")
    p.add_argument("--iters", type=int, default=12)
    args = p.parse_args()
    b, it = args.batch, args.iters
    rng = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}  CFG batch {b} bf16", flush=True)

    from distdiff_tpu.models.layers import ResnetBlock, SpatialTransformer
    from distdiff_tpu.ops.attention import xla_attention
    from distdiff_tpu.ops.flash import flash_attention

    # ---- raw attention shapes (diagnostic: counted inside transformers)
    for (tq, heads, d, n) in [(4096, 10, 64, 10), (1024, 20, 64, 60)]:
        q = jnp.asarray(rng.randn(b, tq, heads, d), jnp.bfloat16)
        flops = 2 * 2 * b * heads * tq * tq * d
        t(flash_attention, [q, q, q], it, f"flash self T{tq} h{heads} d{d}",
          flops=flops, count=n)
        t(xla_attention, [q, q, q], it, f"xla   self T{tq} h{heads} d{d}",
          flops=flops, count=n)
        kv = jnp.asarray(rng.randn(b, 77, heads, d), jnp.bfloat16)
        cflops = 2 * 2 * b * heads * tq * 77 * d
        t(xla_attention, [q, kv, kv], it, f"xla   cross T{tq} h{heads}",
          flops=cflops, count=n)

    total = 0.0
    # ---- resblocks per stage: (hw, c, n_same, n_wide)
    for hw, c, n_same, n_wide in [(128, 320, 3, 2), (64, 640, 2, 3),
                                  (32, 1280, 3, 4)]:
        x = jnp.asarray(rng.randn(b, hw, hw, c), jnp.bfloat16)
        temb = jnp.asarray(rng.randn(b, 1280), jnp.bfloat16)
        rb = ResnetBlock(c, dtype=jnp.bfloat16)
        rp = rb.init(jax.random.PRNGKey(0), x, temb)
        rflops = 2 * b * hw * hw * 9 * c * c * 2
        total += t(rb.apply, [rp, x, temb], it,
                   f"resblock {hw}^2x{c}", flops=rflops, count=n_same,
                   perturb_index=1)
        xw = jnp.asarray(rng.randn(b, hw, hw, 2 * c), jnp.bfloat16)
        rbw = ResnetBlock(c, dtype=jnp.bfloat16)
        rpw = rbw.init(jax.random.PRNGKey(0), xw, temb)
        wflops = (2 * b * hw * hw * 9 * (2 * c * c + c * c)
                  + 2 * b * hw * hw * 2 * c * c)
        total += t(rbw.apply, [rpw, xw, temb], it,
                   f"resblock {hw}^2 {2*c}->{c}", flops=wflops, count=n_wide,
                   perturb_index=1)

    # ---- whole transformer modules (attention + FFN + projections).
    # The real 32^2 modules are depth 10, but a standalone depth-10 trace
    # breaks the remote compile service — time depth 2 and scale x5 (block
    # costs are uniform; only proj_in/out amortization is approximated).
    ctx = jnp.asarray(rng.randn(b, 77, 2048), jnp.bfloat16)
    for hw, c, heads, depth, n, scale in [(64, 640, 10, 2, 5, 1),
                                          (32, 1280, 20, 2, 6, 5)]:
        x = jnp.asarray(rng.randn(b, hw, hw, c), jnp.bfloat16)
        st = SpatialTransformer(num_heads=heads, head_dim=64, depth=depth,
                                dtype=jnp.bfloat16)
        # params as a runtime ARG — closed-over params bake into the HLO as
        # constants and the c1280 module blows the remote compiler's
        # request-size limit (HTTP 413)
        sp = st.init(jax.random.PRNGKey(0), x, ctx)
        label = f"transformer {hw}^2x{c} depth{depth}" + (
            f" (x{scale} ~ depth{depth * scale})" if scale > 1 else "")
        total += t(lambda pp, xx: st.apply(pp, xx, ctx), [sp, x], it,
                   label, count=n * scale, perturb_index=1)

    print(f"resnet+transformer subtotal: {total*1e3:8.2f} ms "
          f"(gap vs the per-step time = conv_in/out, up/down-sample, "
          f"time+added-cond emb, skips, layout copies)", flush=True)


if __name__ == "__main__":
    main()
