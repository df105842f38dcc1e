"""LoRA train-step throughput on the real chip (VERDICT r4 #7).

Times ``train/lora.py:make_lora_train_step`` at the SD-1.5 latent-cache
recipe (512^2 -> 64^2x4 latents, 77-token text states, rank-8 adapters on
the attention projections), batch swept. The step is ONE jitted program:
sample t/noise, W_eff = W + (a/r)ab inside the trace, denoising MSE,
backward over the LoRA leaves only, Adam update.

Timing: varied-input dispatch loop with a host VALUE fetch of the loss
each iteration (the CLAUDE.md tunnel rule — block_until_ready is not a
sync here), min over iters after a warmup.

Run: python scripts/lora_bench.py [--batches 4 8 16] [--iters 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from distdiff_tpu.config import PipelineConfig
from distdiff_tpu.models import UNet2DCondition
from distdiff_tpu.sampling.pipeline import init_params_lazy
from distdiff_tpu.models import AutoencoderKL, CLIPTextEncoder
from distdiff_tpu.schedulers.ddim import make_schedule
from distdiff_tpu.train.lora import init_lora, make_lora_train_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[4, 8, 16])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--rank", type=int, default=8)
    p.add_argument("--tiny", action="store_true",
                   help="toy geometry smoke run (CPU-friendly)")
    args = p.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    config = PipelineConfig.tiny() if args.tiny else PipelineConfig.sd15()
    unet = UNet2DCondition(config.unet)
    vae = AutoencoderKL(config.vae)
    text = CLIPTextEncoder(config.text_encoder)
    params = init_params_lazy(config, unet, vae, text)
    uparams = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params["unet"])
    sched = make_schedule(num_inference_steps=config.num_inference_steps)
    lora = init_lora(jax.random.PRNGKey(0), uparams, rank=args.rank)
    n_leaves = len(jax.tree_util.tree_leaves(lora))
    n_par = sum(x.size for x in jax.tree_util.tree_leaves(lora))
    print(f"rank-{args.rank} LoRA: {n_leaves} leaves, {n_par:,} params",
          file=sys.stderr)
    tx = optax.adam(1e-4)
    opt_state = tx.init(lora)
    step = jax.jit(make_lora_train_step(unet, sched, tx, alpha=args.rank),
                   donate_argnums=(0, 1))

    rng = np.random.RandomState(0)
    ls = config.latent_size
    for b in args.batches:
        lat = jnp.asarray(rng.randn(b, ls, ls, 4) * 0.18, jnp.float32)
        ctx = jnp.asarray(
            rng.randn(b, 77, config.unet.cross_attention_dim), jnp.bfloat16)
        lo = jax.tree.map(jnp.array, lora)
        st = jax.tree.map(jnp.array, opt_state)
        key = jax.random.PRNGKey(1)
        # warmup/compile
        lo, st, loss = step(lo, st, uparams, lat, ctx, key)
        _ = float(loss)
        times = []
        for i in range(args.iters):
            k = jax.random.fold_in(key, i + 1)
            t0 = time.time()
            lo, st, loss = step(lo, st, uparams, lat, ctx, k)
            _ = float(loss)  # host value fetch = the only real sync
            times.append(time.time() - t0)
        dt = min(times)
        print(f"batch {b:3d}: {dt*1e3:8.1f} ms/step  "
              f"{b/dt:7.2f} img/s  {1.0/dt:6.3f} steps/s")


if __name__ == "__main__":
    main()
