"""Guided dataset expansion CLI — the reference's ``generate_data.py`` role
with its FULL flag vocabulary (``generate_data.py:164-639``): every live
flag is implemented, every vestigial DreamBooth flag (the reference forked
its CLI from the diffusers DreamBooth trainer) is accepted as a logged
no-op, and defaults match the reference's — so any published command line
runs unchanged (docs/migration.md).

Pipeline: load SD weights (converted diffusers checkpoint; random init with
a loud warning otherwise) -> SDDataset with text-embed + VAE-latent caching
-> guide model + prototypes (extracted and cached) -> sharded expansion
driver writing ``{output_dir}/{classname}/{stem}_expand_{i}.png``.

Usage (reference recipe, ``scripts/exps/expand_diff.sh``):
  python -m distdiff_tpu.cli.generate_data -d caltech-101 -a resnet50 \
      --encoder_weight_path checkpoint/.../model_best \
      --guidance_type transform_guidance --strength 0.5 --K 3 --rho 10.0 \
      --guidance_step 20 --guidance_period 2 --constraint_value 0.2 \
      --num_images_per_prompt 5 --output_dir data/caltech-101_expansion/...
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os

import numpy as np

from distdiff_tpu.cli.common import add_dataset_args, set_seed, setup_logging

log = logging.getLogger("distdiff.generate")


def _str2bool(v: str) -> bool:
    s = str(v).strip().lower()
    if s in ("true", "1", "yes", "y", "on"):
        return True
    if s in ("false", "0", "no", "n", "off"):
        return False
    raise argparse.ArgumentTypeError(f"expected true/false, got {v!r}")


def build_parser():
    p = argparse.ArgumentParser(description="DistDiff-style guided expansion")
    add_dataset_args(p)
    p.add_argument("--pretrained_model_name_or_path", type=str,
                   default="CompVis/stable-diffusion-v1-4",
                   help="checkpoint id used for cache paths; pass a local "
                        "diffusers dir via --sd_checkpoint for real weights")
    p.add_argument("--sd_checkpoint", type=str, default=None,
                   help="local diffusers-format SD checkpoint dir to convert")
    p.add_argument("--model", type=str, default="sd15",
                   choices=["sd15", "sd21", "sdxl"],
                   help="diffusion backbone: sd15 (reference recipe), "
                        "sd21 (beyond-reference; OpenCLIP-H text tower + "
                        "v-prediction DDIM at 768), or sdxl "
                        "(beyond-reference; dual text encoders + additive "
                        "conditioning, full guided-expansion support)")
    p.add_argument("--params_path", type=str, default=None,
                   help="previously converted/saved params (orbax dir)")
    p.add_argument("--arch", "-a", type=str, default="open_clip_vit_b32")
    p.add_argument("--encoder_weight_path", type=str, default=None)
    p.add_argument("--guidance_type", type=str, default=None,
                   choices=["transform_guidance", "direct_guidance", "none"],
                   help="default: unguided expansion, as in the reference "
                        "(its default None takes neither guidance branch, "
                        "generate_data.py:1203-1210)")
    p.add_argument("--constraint_value", type=float, default=0.8)
    p.add_argument("--steps", type=int, default=None,
                   help="DDIM steps (the reference parses but hardcodes 50, "
                        "generate_data.py:217,1043 — here the flag is live; "
                        "default: the model config's plan, 50 / tiny 10)")
    p.add_argument("--scheduler", type=str, default="ddim",
                   choices=["ddim", "dpmpp"],
                   help="sampling solver (beyond-reference: dpmpp = "
                        "DPM-Solver++(2M); the DistDiff guidance window "
                        "advances with the DDIM update either way and the "
                        "solver history resets at the splice)")
    p.add_argument("--deep_cache", action="store_true",
                   help="DeepCache-style deep-feature caching on the plain "
                        "denoise spans (beyond-reference, approximate; "
                        "guidance steps stay exact; DDIM-only)")
    p.add_argument("--cache_interval", type=int, default=3,
                   help="full UNet step every N steps under --deep_cache")
    p.add_argument("--cache_branch", type=int, default=0,
                   help="down level the cache cuts below (0 = shallowest "
                        "= fastest)")
    p.add_argument("--int8", action="store_true",
                   help="w8a8 int8 UNet denoise spans (ops/quant.py; "
                        "beyond-reference, approximate — 2x int8 MXU peak "
                        "on v5e; guidance steps stay exact bf16)")
    p.add_argument("--K", type=int, default=3)
    p.add_argument("--guidance_step", type=int, default=1)
    p.add_argument("--guidance_period", type=int, default=1)
    p.add_argument("--guidance_step_in_plan", action="store_true",
                   help="beyond-reference: shift a guidance window that "
                        "falls before the img2img start into the executed "
                        "span (short --steps plans stay guided) instead of "
                        "the reference's silent unguided clamp")
    p.add_argument("--total_split", type=int, default=1,
                   help="deliberate default divergence: the reference "
                        "defaults to 8 because its launcher always fans one "
                        "process per GPU; here one process drives the whole "
                        "mesh, so the only sane default is all the work")
    p.add_argument("--split", type=int, default=0)
    p.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel group size: shard each UNet's "
                        "transformer weights Megatron-style over this many "
                        "chips (data x model mesh, parallel/tp.py). Use for "
                        "HBM-starved recipes (SDXL-guided) where one chip "
                        "cannot hold the guidance backward; must divide the "
                        "device count. Default 1 = pure data parallelism")
    p.add_argument("--num_images_per_prompt", type=int, default=4)
    p.add_argument("--first_image_index", type=int, default=0)
    p.add_argument("--optimize_targets", type=str, default=None,
                   help="'-'-separated subset of global_prototype,"
                        "local_prototype; default: both when guided (the "
                        "reference's None default crashes its guided path "
                        "— we fall back instead)")
    p.add_argument("--rho", type=float, default=10.0)
    p.add_argument("--gs", type=float, default=1.0)
    p.add_argument("--ls", type=float, default=1.0)
    p.add_argument("--strength", type=float, default=0.9,
                   help="img2img noising strength (reference default 0.9; "
                        "the published recipe passes 0.5)")
    p.add_argument("--language_enhance", "-le", action="store_true")
    p.add_argument("--text_to_img", action="store_true")
    p.add_argument("--offset_noise", action="store_true",
                   help="add 0.1x per-channel offset to the img2img noise "
                        "(generate_data.py:1164-1168)")
    p.add_argument("--output_dir", type=str, default="data_expand")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--train_batch_size", type=int, default=2,
                   help="per-device batch size")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    # The reference declares this flag `type=bool` (generate_data.py:452-457)
    # so `--do_classifier_free_guidance False` is TRUTHY there — a footgun,
    # not a contract. We deviate deliberately: accept true/false strings and
    # parse them properly (documented in PARITY.md).
    p.add_argument("--do_classifier_free_guidance", type=_str2bool,
                   nargs="?", const=True, default=True,
                   help="true/false (default true); bare flag means true")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--bpe_path", type=str, default=None,
                   help="CLIP BPE merges file for real tokenization")
    p.add_argument("--tiny", action="store_true",
                   help="CPU-runnable toy config (BASELINE config 1)")
    p.add_argument("--max_units", type=int, default=None,
                   help="cap pending work units (smoke runs)")
    p.add_argument("--fused_program", action="store_true",
                   help="compile the whole trajectory as ONE program "
                        "(fastest steady-state, much slower first compile)")
    p.add_argument("--lora", type=str, default=None,
                   help="LoRA adapter .npz (cli.train_lora output) merged "
                        "into the UNet weights before sampling")
    p.add_argument("--lora_alpha", type=float, default=None,
                   help="override the alpha stored in the --lora file")
    p.add_argument("--save_params", type=str, default=None,
                   help="after loading/converting SD weights, save the "
                        "parameter tree here (orbax) for fast reuse via "
                        "--params_path")
    # --- vestigial reference flags: accepted for drop-in compatibility so
    # published commands (e.g. the reference's expand_diff.sh passes
    # --gradient_checkpointing) run unchanged; each is a no-op here because
    # the TPU path subsumes it. main() logs a notice when one is set.
    compat = p.add_argument_group(
        "reference compatibility (accepted and ignored)")
    compat.add_argument("--gradient_checkpointing", action="store_true",
                        help="no-op: guidance rollouts always run under "
                             "jax.checkpoint (remat) policies")
    compat.add_argument("--enable_xformers_memory_efficient_attention",
                        action="store_true",
                        help="no-op: Pallas flash attention is always on")
    compat.add_argument("--mixed_precision", type=str, default=None,
                        choices=["no", "fp16", "bf16"],
                        help="no-op: bf16 activations / fp32 statistics "
                             "are the fixed TPU-native policy")
    compat.add_argument("--allow_tf32", action="store_true",
                        help="no-op: TPU matmul precision is not TF32")
    compat.add_argument("--local_rank", type=int, default=-1,
                        help="no-op: one process drives the whole mesh")
    compat.add_argument("--report_to", type=str, default=None,
                        help="no-op: the reference's tracker logged an "
                             "empty dict; use utils/profiling.py instead")
    compat.add_argument("--gradient_accumulation_steps", type=int, default=1,
                        help="no-op in generation (as in the reference)")
    compat.add_argument("--dataloader_num_workers", type=int, default=0,
                        help="no-op: host prep is pipelined by the driver")
    # The remaining dead DreamBooth-trainer flags (the reference parses them
    # at generate_data.py:164-639 but its generation path never reads them).
    # Hidden from --help to keep it readable; the group description above
    # plus docs/migration.md document the policy.
    for name in _DEAD_STORE_TRUE:
        compat.add_argument("--" + name, action="store_true",
                            help=argparse.SUPPRESS)
    for name, typ in _DEAD_VALUE:
        compat.add_argument("--" + name, type=typ, default=None,
                            help=argparse.SUPPRESS)
    compat.add_argument("--validation_images", nargs="+", default=None,
                        help=argparse.SUPPRESS)
    return p


def parse_args(argv=None):
    args = build_parser().parse_args(argv)
    # Reference-default normalization: its default guidance_type None takes
    # neither guidance branch (generate_data.py:1203-1210) == our "none";
    # its optimize_targets None CRASHES its guided path, so when guided we
    # fall back to both prototype energies instead.
    if args.guidance_type is None:
        args.guidance_type = "none"
    if args.optimize_targets is None:
        args.optimize_targets = "global_prototype-local_prototype"
    return args


_DEAD_STORE_TRUE = (
    "center_crop", "random_flip", "with_prior_preservation",
    "train_text_encoder", "scale_lr", "use_8bit_adam",
    "pre_compute_text_embeddings", "text_encoder_use_attention_mask",
    "skip_save_text_encoder", "set_grads_to_none",
)

_DEAD_VALUE = (
    ("cache_dir", str), ("caption_column", str), ("checkpointing_steps", int),
    ("checkpoints_total_limit", int), ("class_data_dir", str),
    ("class_labels_conditioning", str), ("class_prompt", str),
    ("dataset_config_name", str), ("dataset_name", str),
    ("image_column", str), ("instance_data_dir", str),
    ("instance_prompt", str), ("logging_dir", str),
    ("lr_num_cycles", int), ("lr_power", float), ("lr_scheduler", str),
    ("lr_warmup_steps", int), ("max_grad_norm", float),
    ("max_train_samples", int), ("max_train_steps", int),
    ("num_class_images", int), ("num_train_epochs", int),
    ("prior_generation_precision", str), ("prior_loss_weight", float),
    ("resume_from_checkpoint", str), ("revision", str),
    ("sample_batch_size", int), ("snr_gamma", float),
    ("tokenizer_max_length", int), ("tokenizer_name", str),
    ("train_data_dir", str), ("val_batch_size", int),
    ("validation_scheduler", str), ("variant", str),
)


_COMPAT_IGNORED = (
    ("gradient_checkpointing", False),
    ("enable_xformers_memory_efficient_attention", False),
    ("mixed_precision", None),
    ("allow_tf32", False),
    ("local_rank", -1),
    ("report_to", None),
    ("gradient_accumulation_steps", 1),
    ("dataloader_num_workers", 0),
    ("validation_images", None),
) + tuple((name, False) for name in _DEAD_STORE_TRUE) \
  + tuple((name, None) for name, _ in _DEAD_VALUE)


def _warn_compat_flags(args) -> None:
    set_flags = [name for name, default in _COMPAT_IGNORED
                 if getattr(args, name, default) != default]
    if set_flags:
        log.info("reference-compatibility flags accepted and ignored "
                 "(no-ops on the TPU path): %s", ", ".join(set_flags))


def build_pipeline(args, guide=None, global_protos=None, local_protos=None):
    import jax

    from distdiff_tpu.config import GuidanceConfig, PipelineConfig
    from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig

    model = getattr(args, "model", "sd15")
    sdxl = model == "sdxl"
    if args.tiny:
        if sdxl:
            config = PipelineConfig.sdxl_tiny(
                sample_size=min(args.resolution, 64))
        else:
            config = PipelineConfig.tiny(sample_size=min(args.resolution, 64))
            if model == "sd21":  # exercise the v-prediction path at tiny
                config = dataclasses.replace(
                    config, prediction_type="v_prediction")
        guide_input = config.sample_size
    elif sdxl:
        config = PipelineConfig.sdxl_base(sample_size=args.resolution)
        guide_input = 224
    elif model == "sd21":
        config = PipelineConfig.sd21(sample_size=args.resolution)
        guide_input = 224
    else:
        config = PipelineConfig(sample_size=args.resolution)
        guide_input = 224
    if args.steps is not None:
        # applies to EVERY branch including --tiny (r4 fix: the tiny branch
        # silently ignored --steps, so low-strength runs could never keep
        # the guidance window inside the executed span)
        config = dataclasses.replace(config, num_inference_steps=args.steps)
    if getattr(args, "scheduler", "ddim") != "ddim":
        config = dataclasses.replace(config, scheduler=args.scheduler)
    if getattr(args, "deep_cache", False):
        config = dataclasses.replace(
            config, deep_cache=True, cache_interval=args.cache_interval,
            cache_branch=args.cache_branch)
    if getattr(args, "int8", False):
        config = dataclasses.replace(config, int8=True)

    params = None
    if args.params_path:
        from distdiff_tpu.utils import checkpoints as ckpt

        params = ckpt.restore_pytree(args.params_path)
    elif args.sd_checkpoint:
        from distdiff_tpu.weights.convert import (
            convert_sd_checkpoint,
            convert_sdxl_checkpoint,
        )

        # strict: a partial conversion (any missing/extra/mismatched leaf)
        # raises instead of silently running stale random leaves
        convert = convert_sdxl_checkpoint if sdxl else convert_sd_checkpoint
        params = convert(args.sd_checkpoint, config=config)
        log.info("converted SD checkpoint from %s (validated)", args.sd_checkpoint)
    else:
        log.warning(
            "NO SD WEIGHTS PROVIDED — using random init. Pass --sd_checkpoint "
            "(local diffusers dir) or --params_path for real generation."
        )

    gcfg = GuidanceConfig(
        guidance_type=args.guidance_type,
        guidance_step=args.guidance_step,
        guidance_period=args.guidance_period,
        rho=args.rho,
        constraint_value=args.constraint_value,
        gs=args.gs,
        ls=args.ls,
        K=args.K,
        optimize_targets=tuple(args.optimize_targets.split("-")),
        guide_input_size=guide_input,
        step_in_plan=getattr(args, "guidance_step_in_plan", False),
    )
    pipe = ExpansionPipeline.create(
        config,
        sampler_cfg=SamplerConfig(
            guidance_scale=args.guidance_scale,
            do_classifier_free_guidance=args.do_classifier_free_guidance,
        ),
        guidance_cfg=gcfg,
        params=params,
        guide=guide,
        global_protos=global_protos,
        local_protos=local_protos,
        strength=args.strength,
        offset_noise=args.offset_noise,
        seed=args.seed,
    )
    if getattr(args, "lora", None):
        # bake the adapter into the UNet weights once, before tracing —
        # zero sampling-time overhead (train/lora.py)
        from distdiff_tpu.train.lora import load_lora, merge_lora

        lora, alpha = load_lora(args.lora)
        if getattr(args, "lora_alpha", None) is not None:
            alpha = args.lora_alpha
        pipe.params["unet"] = merge_lora(pipe.params["unet"], lora, alpha)
        log.info("merged LoRA adapter %s (alpha=%g, %d leaves)",
                 args.lora, alpha, len(lora))
    if (gcfg.guidance_type in ("transform_guidance", "direct_guidance")
            and not pipe.guidance_active(text_to_img=args.text_to_img)):
        # The reference silently produces unguided samples in this regime
        # (its hot loop never visits the window's step indices,
        # generate_data.py:1190-1215). Same behavior, but say so.
        log.warning(
            "guidance window (guidance_step=%d from the end of a %d-step "
            "plan) falls before the strength-%.2f img2img start index — "
            "outputs will be UNGUIDED (reference-parity clamp; raise "
            "--strength or --steps, or lower --guidance_step)",
            gcfg.guidance_step, config.num_inference_steps, args.strength,
        )
    return pipe


def prepare_guide_and_prototypes(args, pipe, sd):
    """Guide model + cached prototype extraction (reference path convention
    ``save/prototypes/{arch}/{dataset}/class_wise_prototype_K{K}.npz``)."""
    import jax
    import jax.numpy as jnp

    from distdiff_tpu.data.datasets import BatchLoader, ImageListDataset
    from distdiff_tpu.data.transforms import prototype_transform
    from distdiff_tpu.models.guide import create_model
    from distdiff_tpu.prototypes import (
        build_prototypes,
        load_prototypes,
        normalize_prototypes,
        save_prototypes,
    )

    num_classes = len(sd.class_names)
    arch = args.arch if not args.tiny else "tiny_resnet"
    guide = create_model(
        arch, num_classes=num_classes, weight_path=args.encoder_weight_path,
        input_size=pipe.guidance_cfg.guide_input_size,
    )
    if arch == "open_clip_vit_b32" and guide.text_variables is not None:
        # real zero-shot head: dataset template + class names through the
        # converted OpenCLIP text tower (reference model_utils.py:74-85)
        from distdiff_tpu.data.templates import template_for
        from distdiff_tpu.models.guide.factory import (
            build_zero_shot_text_features,
        )

        guide.class_text_features = jnp.asarray(build_zero_shot_text_features(
            sd.class_names, template=template_for(args.dataset),
            variables=guide.text_variables, bpe_path=args.bpe_path,
            checkpoint_dir=args.sd_checkpoint,
            activation=guide.text_activation,
        ))

    proto_path = os.path.join(
        "save/prototypes", arch, args.dataset, f"class_wise_prototype_K{args.K}.npz"
    )
    if os.path.exists(proto_path):
        gp, lp = load_prototypes(proto_path)
        log.info("loaded prototypes from %s", proto_path)
    else:
        size = pipe.guidance_cfg.guide_input_size
        ds = ImageListDataset(sd.image_paths, sd.labels, prototype_transform(size))
        loader = BatchLoader(ds, batch_size=16, num_threads=4)
        encode = jax.jit(lambda x: guide.encode_image(x))
        # padded tail rows are excluded via the mask
        feats, labels = [], []
        for imgs, tgt, mask in loader:
            f = np.asarray(encode(jnp.asarray(imgs)), np.float32)
            f = f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-12)
            feats.append(f[mask])
            labels.append(tgt[mask])
        feats = np.concatenate(feats, 0)
        labels = np.concatenate(labels, 0)
        gp, lp = build_prototypes(feats, labels, num_classes, k=args.K)
        save_prototypes(proto_path, gp, lp)
        gp, lp = normalize_prototypes(gp, lp)
        log.info("extracted prototypes -> %s", proto_path)
    return guide, gp, lp


def main(argv=None):
    args = parse_args(argv)
    setup_logging()
    _warn_compat_flags(args)
    set_seed(args.seed)

    import jax
    import jax.numpy as jnp

    from distdiff_tpu.data import SDDataset
    from distdiff_tpu.models import load_tokenizer
    from distdiff_tpu.parallel import ExpansionDriver

    # bootstrap pipeline (no guide yet) for text/vae encoders
    pipe = build_pipeline(args)
    params = pipe.params
    if args.save_params:
        from distdiff_tpu.utils import checkpoints as ckpt

        ckpt.save_pytree(args.save_params, params)
        log.info("saved SD params to %s", args.save_params)
    tokenizer = load_tokenizer(
        args.bpe_path,
        max_length=pipe.config.text_encoder.max_length,
        vocab_size=pipe.config.text_encoder.vocab_size,
        checkpoint_dir=args.sd_checkpoint,
        # real weights + hash-tokenized prompts = silently wrong text
        # conditioning; refuse (ADVICE r1) unless this is a toy run
        strict=bool(args.sd_checkpoint or args.params_path) and not args.tiny,
    )
    encode_images = jax.jit(lambda im: pipe.encode_images(params, im))
    if pipe.is_sdxl:
        # dual-tower conditioning pytree {"ctx", "add"}; both towers consume
        # the same CLIP-BPE tokenization (diffusers' tokenizer_2 differs
        # only in its pad token — the context positions past <eot> carry
        # negligible signal; documented simplification)
        from distdiff_tpu.sampling.conditioning import cond_asarray

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
    )

    guide = gp = lp = None
    if args.guidance_type != "none":
        guide, gp, lp = prepare_guide_and_prototypes(args, pipe, sd)
        # rebuild the pipeline bundle with guidance attached
        pipe.guide = guide
        pipe.global_protos = jnp.asarray(gp)
        pipe.local_protos = jnp.asarray(lp)

    from distdiff_tpu.parallel.mesh import make_expand_mesh

    mesh = make_expand_mesh(args.mesh_model)
    param_shardings = None
    if args.mesh_model > 1:
        # tensor-parallel expansion: Megatron col/row specs on the UNet
        # transformer Denses, everything else replicated; the Pallas flash
        # kernel runs shard_map'd per (batch, head) block (ops/attention).
        from distdiff_tpu.ops.attention import set_tp_attention
        from distdiff_tpu.parallel.tp import unet_param_shardings

        param_shardings = unet_param_shardings(mesh, pipe.full_params())
        set_tp_attention(mesh)
        log.info("tensor-parallel expansion: mesh %s", dict(mesh.shape))
    if args.fused_program:
        expand_fn = pipe.make_expand_fn(text_to_img=args.text_to_img)
        prejitted = False
    else:
        expand_fn = pipe.make_split_expand(
            text_to_img=args.text_to_img, mesh=mesh,
            param_shardings=param_shardings,
        )
        prejitted = True
    driver = ExpansionDriver(
        expand_fn,
        pipe.full_params(),
        sd,
        args.output_dir,
        per_device_batch=args.train_batch_size,
        seed=args.seed,
        mesh=mesh,
        prejitted=prejitted,
        param_shardings=param_shardings,
    )
    stats = driver.run(
        num_images_per_prompt=args.num_images_per_prompt,
        first_image_index=args.first_image_index,
        split=args.split,
        total_split=args.total_split,
        max_units=args.max_units,
    )
    print(
        f"expansion finished: {stats['written']} images in "
        f"{stats['seconds']:.1f}s "
        f"({stats['images_per_sec_per_device']:.3f} img/s/chip)"
    )
    return stats


if __name__ == "__main__":
    main()
