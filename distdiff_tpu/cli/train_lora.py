"""LoRA fine-tuning CLI for the diffusion UNet.

Beyond-reference surface (the reference never trains its SD model): adapt
the generative prior to the target dataset BEFORE expansion —

    python -m distdiff_tpu.cli.train_lora \\
        --dataset cifar100-s --output_dir ./lora_runs/c100 \\
        --sd_checkpoint /path/to/stable-diffusion-v1-5 \\
        --rank 8 --steps 2000 --batch 8

then expand with the adapter merged in:

    python -m distdiff_tpu.cli.generate_data ... \\
        --lora ./lora_runs/c100/lora.npz

Reuses the whole expansion stack: the same ``build_pipeline`` weight
loading (strict converted checkpoints / orbax / tiny), the same tokenizer
discovery, and the ``SDDataset`` VAE-latent + text-embed caches — training
batches come straight from the latent cache, so after the first epoch of
encoding the loop touches no PIL/VAE-encode work at all. The train step
itself is ONE jitted program (``train/lora.py:make_lora_train_step``).
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import numpy as np

from distdiff_tpu.cli.common import set_seed, setup_logging

log = logging.getLogger("distdiff.train_lora")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--model", type=str, default="sd15",
                   choices=["sd15", "sd21", "sdxl"])
    p.add_argument("--pretrained_model_name_or_path", type=str,
                   default="CompVis/stable-diffusion-v1-4",
                   help="cache naming only (as in generate_data)")
    p.add_argument("--sd_checkpoint", type=str, default=None)
    p.add_argument("--params_path", type=str, default=None)
    p.add_argument("--bpe_path", type=str, default=None)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--language_enhance", "-le", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny pipeline config (tests/smoke)")
    # LoRA hyperparameters
    p.add_argument("--rank", type=int, default=8)
    p.add_argument("--alpha", type=float, default=None,
                   help="LoRA scale; default = rank (delta at full strength)")
    p.add_argument("--targets", type=str, default="to_q-to_k-to_v-to_out",
                   help="'-'-separated Dense-module name prefixes to adapt")
    # optimization
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--save_every", type=int, default=0,
                   help="also checkpoint every N steps (0 = final only)")
    return p.parse_args(argv)


def _pipeline_args(args):
    """Adapter namespace for generate_data.build_pipeline (guidance off)."""
    return argparse.Namespace(
        model=args.model, tiny=args.tiny, resolution=args.resolution,
        steps=50, scheduler="ddim", deep_cache=False,
        params_path=args.params_path, sd_checkpoint=args.sd_checkpoint,
        guidance_type="none", guidance_step=20, guidance_period=2,
        rho=10.0, constraint_value=0.2, gs=1.0, ls=1.0, K=1,
        optimize_targets="global-local", guidance_scale=7.5,
        do_classifier_free_guidance=True, strength=0.5, offset_noise=False,
        seed=args.seed, lora=None,
    )


def main(argv=None):
    args = parse_args(argv)
    setup_logging()
    set_seed(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import optax

    from distdiff_tpu.cli.generate_data import build_pipeline
    from distdiff_tpu.data import SDDataset
    from distdiff_tpu.models import load_tokenizer
    from distdiff_tpu.sampling.conditioning import cond_asarray, cond_index
    from distdiff_tpu.train.lora import (
        init_lora,
        make_lora_train_step,
        save_lora,
    )

    pipe = build_pipeline(_pipeline_args(args))
    params = pipe.params
    tokenizer = load_tokenizer(
        args.bpe_path,
        max_length=pipe.config.text_encoder.max_length,
        vocab_size=pipe.config.text_encoder.vocab_size,
        checkpoint_dir=args.sd_checkpoint,
        strict=bool(args.sd_checkpoint or args.params_path) and not args.tiny,
    )
    encode_images = jax.jit(lambda im: pipe.encode_images(params, im))
    if pipe.is_sdxl:
        encode_pair = jax.jit(
            lambda i1, i2: pipe.encode_text_pair(params, i1, i2))

        def encode_text_fn(prompts):
            ids = jnp.asarray(tokenizer(list(prompts)))
            return cond_asarray(encode_pair(ids, ids))
    else:
        encode_text = jax.jit(lambda ids: pipe.encode_text(params, ids))

        def encode_text_fn(prompts):
            return np.asarray(
                encode_text(jnp.asarray(tokenizer(list(prompts)))))

    sd = SDDataset(
        args.dataset,
        encode_text_fn=encode_text_fn,
        encode_images_fn=lambda im: np.asarray(encode_images(jnp.asarray(im))),
        model_name=args.pretrained_model_name_or_path,
        size=pipe.config.sample_size,
        language_enhance=args.language_enhance,
        data_root=args.data_root,
        seed=args.seed,
    )
    latents = np.asarray(sd.latents, np.float32)
    labels = np.asarray(sd.labels, np.int64)
    log.info("dataset %s: %d images, latent grid %s",
             args.dataset, len(sd), latents.shape[1:])

    alpha = float(args.alpha if args.alpha is not None else args.rank)
    targets = tuple(args.targets.split("-"))
    lora = init_lora(jax.random.PRNGKey(args.seed), params["unet"],
                     rank=args.rank, targets=targets)
    log.info("LoRA rank %d over %d leaves (%s), alpha=%g",
             args.rank, len(lora), ",".join(targets), alpha)

    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = tx.init(lora)
    if pipe.is_sdxl:
        def apply_fn(p, x, t, ctx):
            return pipe.unet.apply(
                {"params": p}, x, t, ctx["ctx"], ctx["add"])
    else:
        apply_fn = None
    step_fn = jax.jit(make_lora_train_step(
        pipe.unet, pipe.sched, tx, alpha=alpha, apply_fn=apply_fn))

    rng = np.random.default_rng(args.seed)
    jrng = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    running = []
    for step in range(1, args.steps + 1):
        idx = rng.integers(0, len(sd), size=args.batch)
        batch_lat = jnp.asarray(latents[idx])
        if sd.language_enhance:
            from distdiff_tpu.sampling.conditioning import (
                cond_leading_dim,
                cond_stack,
            )

            conds = []
            for lab in labels[idx]:
                bank = sd.class_embeds[int(lab)]
                conds.append(cond_index(
                    bank, int(rng.integers(0, cond_leading_dim(bank)))))
            ctx = cond_stack(conds)
        else:
            ctx = cond_index(sd.class_embeds, labels[idx])
        ctx = jax.tree.map(jnp.asarray, ctx)
        lora, opt_state, loss = step_fn(
            lora, opt_state, params["unet"], batch_lat, ctx,
            jax.random.fold_in(jrng, step))
        running.append(float(loss))
        if step % args.log_every == 0 or step == args.steps:
            log.info("step %d/%d  loss %.4f  (%.2f steps/s)", step,
                     args.steps, float(np.mean(running[-args.log_every:])),
                     step / (time.time() - t0))
        if args.save_every and step % args.save_every == 0:
            save_lora(os.path.join(args.output_dir, f"lora_{step:06d}.npz"),
                      lora, alpha=alpha)

    out = os.path.join(args.output_dir, "lora.npz")
    save_lora(out, lora, alpha=alpha)
    log.info("saved %s (final loss %.4f, %.1fs)", out,
             float(np.mean(running[-10:])), time.time() - t0)
    print(f"lora saved: {out}")
    return out


if __name__ == "__main__":
    main()
