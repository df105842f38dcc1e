"""Closed-loop accuracy protocol: expansion -> downstream training -> delta.

The reference's REAL evaluation harness is statistical: expand a small
dataset with guided diffusion, train a downstream classifier over 3 seeds on
original⊕expanded, and report mean±std accuracy against the baselines
(``/root/reference/scripts/exps/train_expand.sh:9-31`` loops seeds 1..3 over
``train_expanded_data_concat_original.py``; ``parse_logs.py:21-66``
aggregates). This script runs that whole loop as ONE command:

  1. guided expansion   (generate_data --guidance_type transform_guidance)
  2. unguided expansion (generate_data --guidance_type none)
  3. downstream training, N seeds x {original-only, ⊕unguided, ⊕guided}
  4. parse_logs aggregation -> a mean±std comparison table

Default mode fabricates a toy dataset and runs the tiny pipeline config —
this proves the full reference WORKFLOW end-to-end on any box (it is the
repo's executable protocol definition, exercised by
tests/test_quality_loop.py). With real SD weights + a real dataset root it
becomes the reference measurement itself:

  python scripts/quality_loop.py \\
      --dataset caltech-101 --data_root ./data --no-tiny \\
      --sd_checkpoint /path/to/stable-diffusion-v1-4 \\
      --arch resnet50 --epochs 100 --train_batch 64 --lr 0.1 \\
      --num_images_per_prompt 5 --seeds 1 2 3

(North-star quality target, BASELINE.md: guided-expansion downstream
accuracy within 0.3% of the reference's published mean on the same recipe.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dataset", default="breastmnist")
    p.add_argument("--data_root", default=None,
                   help="existing dataset root; default fabricates a toy "
                        "class-dir tree under --workdir")
    p.add_argument("--workdir", default="quality_loop_out")
    p.add_argument("--arch", default="tiny_resnet")
    p.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--train_batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--input_size", type=int, default=16)
    p.add_argument("--num_images_per_prompt", type=int, default=1)
    p.add_argument("--resolution", type=int, default=32)
    p.add_argument("--sd_checkpoint", default=None)
    p.add_argument("--no-tiny", dest="tiny", action="store_false",
                   help="real pipeline geometry (needs --sd_checkpoint)")
    p.add_argument("--guidance_step", type=int, default=4)
    p.add_argument("--guidance_period", type=int, default=2)
    p.add_argument("--K", type=int, default=2)
    p.add_argument("--strength", type=float, default=0.5,
                   help="img2img noising strength for the expansions")
    p.add_argument("--guidance_scale", type=float, default=7.5,
                   help="CFG scale for the expansions")
    p.add_argument("--steps", type=int, default=None,
                   help="DDIM steps for the expansions (more steps keep "
                        "the guidance window inside the executed span at "
                        "low --strength)")
    # fast-mode quality validation (VERDICT r4 #2): run the SAME protocol
    # with the approximate/alternative generation modes so every shipped
    # perf number has a paired downstream-accuracy number
    p.add_argument("--scheduler", default="ddim",
                   choices=["ddim", "dpmpp"],
                   help="sampling solver for BOTH expansion arms")
    p.add_argument("--deep_cache", action="store_true",
                   help="DeepCache on both expansion arms")
    p.add_argument("--int8", action="store_true",
                   help="int8 w8a8 denoise spans on both expansion arms")
    p.add_argument("--guided_mode", default="transform_guidance",
                   choices=["transform_guidance", "direct_guidance"],
                   help="guidance type for the guided arm")
    # fabricated-dataset scale (ignored when --data_root is given)
    p.add_argument("--n_classes", type=int, default=2)
    p.add_argument("--n_train", type=int, default=6)
    p.add_argument("--n_test", type=int, default=4)
    p.add_argument("--toy_size", type=int, default=20)
    p.add_argument("--toy_noise", type=float, default=45.0,
                   help="per-pixel noise sigma in the fabricated data")
    p.add_argument("--toy_jitter", type=float, default=0.0,
                   help="per-IMAGE class-color jitter sigma; raise toward "
                        "the inter-class color distance to pull baseline "
                        "accuracy off 100%% (class distributions overlap, "
                        "so extra in-distribution data genuinely helps)")
    # reference protocol step 1 ("obtain guide model", README.md:39-46):
    # train the guide encoder on the ORIGINAL data first and feed its
    # checkpoint to the expansion, instead of guiding with random features
    p.add_argument("--train_guide", action="store_true")
    p.add_argument("--guide_epochs", type=int, default=None,
                   help="epochs for the guide-encoder pre-training "
                        "(default: same as --epochs)")
    # the reference's SD VAE is a REAL autoencoder; the tiny config's
    # random-weight VAE destroys its input (decode(encode(x)) !~ x), which
    # makes every expansion label noise regardless of strength. This stage
    # trains the tiny VAE on reconstruction so the tiny loop operates in
    # the same regime as the real pipeline.
    p.add_argument("--train_vae", action="store_true")
    p.add_argument("--vae_steps", type=int, default=800)
    # the reference's SD UNet is a TRAINED denoiser; the tiny config's
    # random UNet means every executed denoise step moves latents AWAY from
    # the data manifold, so expansions can only ever be corrupted copies and
    # the reference ordering (guided > unguided > original) cannot emerge.
    # This stage trains the tiny UNet with the standard eps-prediction MSE
    # (the reference SD training objective) on the (trained-)VAE latents of
    # the original images, conditioned on the SAME per-class prompt
    # embeddings the expansion uses, with 10% uncond dropout for CFG.
    p.add_argument("--train_unet", action="store_true")
    p.add_argument("--unet_steps", type=int, default=2000)
    return p.parse_args(argv)


def fabricate_toy_dataset(root: str, n_classes: int = 2, n_train: int = 6,
                          n_test: int = 4, size: int = 20,
                          noise: float = 45.0, jitter: float = 0.0):
    """Class-per-dir medmnist-style tree with learnable color structure.

    Each class gets a fixed random mean-color signature; every IMAGE draws
    its own color at class mean + N(0, jitter) (so with jitter on the order
    of the inter-class distance the class-conditional distributions overlap
    and the tiny train split undersamples them — the regime where dataset
    expansion can genuinely move test accuracy), then per-pixel noise on
    top. With jitter=0 a class-positioned bright stripe keeps the legacy
    trivially-separable smoke behavior.
    """
    from PIL import Image

    classes = [f"class_{i:02d}" for i in range(n_classes)]
    base = os.path.join(root, "medmnist", "breastmnist")
    crng = np.random.RandomState(1234)
    colors = crng.randint(40, 200, (n_classes, 3))
    for ci, cat in enumerate(classes):
        for split, n in (("train", n_train), ("test", n_test)):
            rng = np.random.RandomState(7919 * ci + (0 if split == "train" else 1))
            for k in range(n):
                d = os.path.join(base, split, cat)
                os.makedirs(d, exist_ok=True)
                img_color = colors[ci] + rng.normal(0.0, jitter, 3)
                arr = rng.normal(img_color, noise, (size, size, 3))
                if jitter == 0.0:
                    row = (ci * size) // max(n_classes, 1)
                    arr[row, :, :] += 40.0  # class-positioned bright stripe
                arr = np.clip(arr, 0, 255).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{split}_{k}.png"))
    return root


def run_expansion(args, guidance_type: str, out_dir: str,
                  encoder_weight_path=None, params_path=None):
    from distdiff_tpu.cli import generate_data as cli_gen

    argv = [
        "-d", args.dataset, "--data_root", args.data_root,
        "--guidance_type", guidance_type,
        "--guidance_step", str(args.guidance_step),
        "--guidance_period", str(args.guidance_period), "--K", str(args.K),
        "--num_images_per_prompt", str(args.num_images_per_prompt),
        "--train_batch_size", "1",
        # the calibrated recipes (docs/quality_loop_v5e_r4.md) were measured
        # at constraint 0.2 — pin it, since the CLI default now matches the
        # reference's 0.8
        "--constraint_value", "0.2",
        "--strength", str(args.strength),
        "--guidance_scale", str(args.guidance_scale),
        "--output_dir", out_dir, "--seed", "0",
        "--resolution", str(args.resolution),
    ]
    if args.steps is not None:
        argv += ["--steps", str(args.steps)]
    if getattr(args, "scheduler", "ddim") != "ddim":
        argv += ["--scheduler", args.scheduler]
    if getattr(args, "deep_cache", False):
        argv += ["--deep_cache"]
    if getattr(args, "int8", False):
        argv += ["--int8"]
    if args.tiny:
        argv += ["--tiny"]
    if args.sd_checkpoint:
        argv += ["--sd_checkpoint", args.sd_checkpoint]
    if encoder_weight_path:
        argv += ["--encoder_weight_path", encoder_weight_path]
    if params_path:
        argv += ["--params_path", params_path]
    stats = cli_gen.main(argv)
    print(f"[quality_loop] expansion ({guidance_type}): "
          f"{stats['written']} images -> {out_dir}", flush=True)
    return stats


def pretrain_tiny_vae(args, out_path: str) -> str:
    """Train the tiny pipeline's VAE to reconstruct the original images and
    save the full SD param tree for ``--params_path``.

    Loss: pixel MSE + tiny KL (keeps the posterior sane) + a latent-scale
    term pulling the SCALED latent (z * scaling_factor, what the DDIM
    img2img path noises) toward unit RMS so add_noise operates at its
    design point. ~1e4 params, one jitted full-batch Adam loop.
    """
    import glob

    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image

    from distdiff_tpu.cli.generate_data import build_pipeline
    from distdiff_tpu.cli.generate_data import parse_args as gparse

    if os.path.exists(os.path.join(out_path, "_METADATA")) or (
            os.path.isdir(out_path) and os.listdir(out_path)):
        print(f"[quality_loop] reuse pretrained VAE params {out_path}",
              flush=True)
        return out_path

    gargs = gparse(["-d", args.dataset, "--output_dir", "unused", "--tiny",
                    "--resolution", str(args.resolution), "--seed", "0"])
    pipe = build_pipeline(gargs)
    size = pipe.config.sample_size
    files = sorted(glob.glob(os.path.join(
        args.data_root, "medmnist", args.dataset, "train", "*", "*.png")))
    assert files, args.data_root
    imgs = np.stack([
        np.asarray(
            Image.open(f).convert("RGB").resize((size, size), Image.BICUBIC),
            np.float32,
        ) / 127.5 - 1.0
        for f in files
    ])
    x = jnp.asarray(imgs)

    vae = pipe.vae
    sf = pipe.config.vae.scaling_factor
    params = dict(pipe.params)
    vp0 = params["vae"]
    tx = optax.adam(2e-3)

    def loss_fn(vp):
        mean, logvar = vae.apply({"params": vp}, x,
                                 method=type(vae).encode_moments)
        recon = vae.apply({"params": vp}, mean, method=type(vae).decode)
        mse = jnp.mean((recon - x) ** 2)
        kl = jnp.mean(0.5 * (mean ** 2 + jnp.exp(logvar) - 1.0 - logvar))
        rms = jnp.sqrt(jnp.mean((mean * sf) ** 2) + 1e-8)
        return mse + 1e-4 * kl + 0.05 * (rms - 1.0) ** 2, (mse, rms)

    @jax.jit
    def step(vp, opt):
        (l, (mse, rms)), g = jax.value_and_grad(loss_fn, has_aux=True)(vp)
        upd, opt = tx.update(g, opt, vp)
        return optax.apply_updates(vp, upd), opt, l, mse, rms

    vp, opt = vp0, tx.init(vp0)
    mse = rms = float("nan")  # --vae_steps 0: checkpoint the tree untouched
    for i in range(args.vae_steps):
        vp, opt, l, mse, rms = step(vp, opt)
    print(f"[quality_loop] tiny VAE pretrained: recon mse {float(mse):.4f}, "
          f"scaled-latent rms {float(rms):.2f} ({args.vae_steps} steps)",
          flush=True)
    params["vae"] = vp
    from distdiff_tpu.utils import checkpoints as ckpt

    ckpt.save_pytree(out_path, params)
    return out_path


def pretrain_tiny_unet(args, in_params_path, out_path: str) -> str:
    """Denoising pre-training for the tiny UNet (reference-regime parity).

    Standard diffusion training (the objective behind the reference's SD
    checkpoint): eps-prediction MSE over uniformly sampled timesteps on the
    VAE latents of the original train images, conditioned on the per-class
    prompt embeddings (``data/templates.py``) with 10% uncond dropout so
    the CFG pair at generation time is meaningful. Starts from
    ``in_params_path`` (the --train_vae output) when given, so the latents
    being denoised are the ones generation will actually traverse.
    """
    import glob

    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image

    from distdiff_tpu.cli.generate_data import build_pipeline
    from distdiff_tpu.cli.generate_data import parse_args as gparse
    from distdiff_tpu.data.templates import template_for
    from distdiff_tpu.models import load_tokenizer
    from distdiff_tpu.schedulers.ddim import add_noise
    from distdiff_tpu.utils import checkpoints as ckpt

    if os.path.exists(os.path.join(out_path, "_METADATA")) or (
            os.path.isdir(out_path) and os.listdir(out_path)):
        print(f"[quality_loop] reuse pretrained UNet params {out_path}",
              flush=True)
        return out_path

    gargv = ["-d", args.dataset, "--output_dir", "unused", "--tiny",
             "--resolution", str(args.resolution), "--seed", "0"]
    if in_params_path:
        gargv += ["--params_path", in_params_path]
    gargs = gparse(gargv)
    pipe = build_pipeline(gargs)
    size = pipe.config.sample_size
    sf = pipe.config.vae.scaling_factor
    params = dict(pipe.params)

    train_root = os.path.join(
        args.data_root, "medmnist", args.dataset, "train")
    classes = sorted(
        d for d in os.listdir(train_root)
        if os.path.isdir(os.path.join(train_root, d)))
    files, labels = [], []
    for ci, cat in enumerate(classes):
        fs = sorted(glob.glob(os.path.join(train_root, cat, "*.png")))
        files += fs
        labels += [ci] * len(fs)
    assert files, train_root
    imgs = np.stack([
        np.asarray(
            Image.open(f).convert("RGB").resize((size, size), Image.BICUBIC),
            np.float32,
        ) / 127.5 - 1.0
        for f in files
    ])
    x = jnp.asarray(imgs)
    y = jnp.asarray(np.asarray(labels, np.int32))

    # latents exactly as the img2img path sees them: posterior mean * sf
    mean, _ = pipe.vae.apply({"params": params["vae"]}, x,
                             method=type(pipe.vae).encode_moments)
    latents = mean * sf

    # per-class ctx through the SAME template + tokenizer + text encoder
    # the expansion uses (generate_data.py main); index -1 is uncond ("")
    template = template_for(args.dataset)
    tok = load_tokenizer(
        max_length=pipe.config.text_encoder.max_length,
        vocab_size=pipe.config.text_encoder.vocab_size, strict=False)
    prompts = [template.format(c) for c in classes] + [""]
    ctx_bank = pipe.encode_text(params, jnp.asarray(tok(prompts)))

    sched = pipe.sched
    n_train = sched.alphas_cumprod.shape[0]
    unet = pipe.unet
    tx = optax.adam(2e-3)

    def loss_fn(up, t, noise, drop):
        cls_ctx = ctx_bank[y]
        unc_ctx = jnp.broadcast_to(ctx_bank[-1][None], cls_ctx.shape)
        ctx = jnp.where(drop[:, None, None], unc_ctx, cls_ctx)
        x_t = add_noise(sched, latents, noise, t)
        pred = unet.apply({"params": up}, x_t, t, ctx)
        if sched.prediction_type == "v_prediction":
            a = sched.alphas_cumprod[t].astype(jnp.float32)
            while a.ndim < latents.ndim:
                a = a[..., None]
            target = (jnp.sqrt(a) * noise.astype(jnp.float32)
                      - jnp.sqrt(1.0 - a) * latents.astype(jnp.float32))
        else:
            target = noise.astype(jnp.float32)
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    @jax.jit
    def step(up, opt, key):
        kt, kn, kd = jax.random.split(key, 3)
        t = jax.random.randint(kt, (latents.shape[0],), 0, n_train)
        noise = jax.random.normal(kn, latents.shape, jnp.float32)
        drop = jax.random.uniform(kd, (latents.shape[0],)) < 0.1
        l, g = jax.value_and_grad(loss_fn)(up, t, noise, drop)
        upd, opt = tx.update(g, opt, up)
        return optax.apply_updates(up, upd), opt, l

    up, opt = params["unet"], tx.init(params["unet"])
    key = jax.random.PRNGKey(0)
    l = float("nan")  # --unet_steps 0: checkpoint the tree untouched
    for i in range(args.unet_steps):
        key, sub = jax.random.split(key)
        up, opt, l = step(up, opt, sub)
    print(f"[quality_loop] tiny UNet pretrained: denoise loss "
          f"{float(l):.4f} ({args.unet_steps} steps, {len(files)} images, "
          f"{len(classes)} classes)", flush=True)
    params["unet"] = up
    ckpt.save_pytree(out_path, params)
    return out_path


def train_guide_encoder(args, ckpt_root: str) -> str:
    """Reference protocol step 1: train the guide encoder on the original
    data (``README.md:39-46``) and return its best-checkpoint path for
    ``--encoder_weight_path``. Prototypes then come from TRAINED features
    instead of random init, which is what makes the energy class-aware."""
    from distdiff_tpu.cli import train as cli_train

    ckpt = os.path.join(ckpt_root, "guide_encoder")
    best = os.path.join(ckpt, "model_best")
    if not os.path.exists(os.path.join(ckpt, "results.yaml")):
        cli_train.main([
            "-d", args.dataset, "--data_root", args.data_root,
            "-a", args.arch,
            "--epochs", str(args.guide_epochs or args.epochs),
            "--train-batch", str(args.train_batch),
            "--test-batch", str(args.train_batch),
            "--input_size", str(args.input_size), "--lr", str(args.lr),
            "--manualSeed", "0", "--checkpoint", ckpt,
        ])
    print(f"[quality_loop] guide encoder trained -> {best}", flush=True)
    return best


def run_training(args, variant: str, expanded_dir, ckpt_root: str):
    """One variant x all seeds through the downstream trainer CLIs."""
    from distdiff_tpu.cli import train as cli_train
    from distdiff_tpu.cli import train_expanded as cli_train_expanded

    for seed in args.seeds:
        ckpt = os.path.join(ckpt_root, variant, f"seed{seed}")
        if os.path.exists(os.path.join(ckpt, "results.yaml")):
            print(f"[quality_loop] skip existing {ckpt}", flush=True)
            continue
        argv = [
            "-d", args.dataset, "--data_root", args.data_root,
            "-a", args.arch, "--epochs", str(args.epochs),
            "--train-batch", str(args.train_batch),
            "--test-batch", str(args.train_batch),
            "--input_size", str(args.input_size), "--lr", str(args.lr),
            "--manualSeed", str(seed), "--checkpoint", ckpt,
        ]
        if expanded_dir is None:
            cli_train.main(argv)
        else:
            cli_train_expanded.main(
                argv + ["--data_expanded_dir", expanded_dir])


def aggregate(ckpt_root: str, variants):
    from distdiff_tpu.cli.parse_logs import collect

    table = {}
    for v in variants:
        perfs = collect(os.path.join(ckpt_root, v), multi=True)
        table[v] = {
            "n": len(perfs),
            "mean": float(np.mean(perfs)) if perfs else None,
            "std": float(np.std(perfs)) if perfs else None,
        }
    return table


def main(argv=None):
    args = parse_args(argv)
    if not args.tiny and (args.train_vae or args.train_unet):
        raise SystemExit(
            "--train_vae/--train_unet pre-train the TINY pipeline geometry "
            "and would silently shadow --sd_checkpoint via --params_path; "
            "with --no-tiny the checkpoint is already a trained "
            "denoiser — drop these flags.")
    os.makedirs(args.workdir, exist_ok=True)
    if args.data_root is None:
        args.data_root = fabricate_toy_dataset(
            os.path.join(args.workdir, "data"), n_classes=args.n_classes,
            n_train=args.n_train, n_test=args.n_test, size=args.toy_size,
            noise=args.toy_noise, jitter=args.toy_jitter)

    ckpt_root = os.path.join(args.workdir, "checkpoint")
    encoder_path = (
        train_guide_encoder(args, ckpt_root) if args.train_guide else None)
    params_path = (
        pretrain_tiny_vae(args, os.path.join(args.workdir, "sd_params"))
        if args.train_vae else None)
    if args.train_unet:
        params_path = pretrain_tiny_unet(
            args, params_path, os.path.join(args.workdir, "sd_params_unet"))

    guided_dir = os.path.join(args.workdir, "expanded_guided")
    unguided_dir = os.path.join(args.workdir, "expanded_unguided")
    run_expansion(args, args.guided_mode, guided_dir,
                  encoder_weight_path=encoder_path, params_path=params_path)
    run_expansion(args, "none", unguided_dir,
                  encoder_weight_path=encoder_path, params_path=params_path)
    run_training(args, "original", None, ckpt_root)
    run_training(args, "unguided", unguided_dir, ckpt_root)
    run_training(args, "guided", guided_dir, ckpt_root)

    table = aggregate(ckpt_root, ["original", "unguided", "guided"])
    print("\n=== quality loop: downstream accuracy (mean ± std over "
          f"{len(args.seeds)} seeds) ===")
    for v, row in table.items():
        if row["mean"] is None:
            print(f"{v:<10s}  (no results)")
        else:
            print(f"{v:<10s}  {row['mean']:6.2f} ± {row['std']:.2f}  "
                  f"(n={row['n']})")
    g, u, o = table["guided"], table["unguided"], table["original"]
    if g["mean"] is not None and u["mean"] is not None:
        print(f"delta guided-vs-unguided: {g['mean'] - u['mean']:+.2f}")
    if g["mean"] is not None and o["mean"] is not None:
        print(f"delta guided-vs-original: {g['mean'] - o['mean']:+.2f}")
    with open(os.path.join(args.workdir, "quality_loop.json"), "w") as f:
        json.dump(table, f, indent=2)
    return table


if __name__ == "__main__":
    main()
