"""Benchmark: guided images/sec/chip for the DistDiff expansion hot path.

Runs the REAL SD-1.5-geometry pipeline (UNet 860M + VAE + guide ResNet-50,
random weights — throughput does not depend on weight values) on the
attached TPU chip: DDIM-50 at 512², strength 0.5 (25 executed steps), CFG
7.5, transform_guidance at the reference window (step 30/50, period 2) with
gradient through 2 UNet forwards + VAE decode + ResNet-50 — the exact
recipe pinned in BASELINE.md.

Prints ONE JSON line:
  {"metric": "guided images/sec/chip", "value": N, "unit": "img/s/chip",
   "vs_baseline": N / 2.0}   (north star: >= 2 img/s/chip)

``--preset tiny`` is the CPU-runnable smoke config; ``--check`` validates
the flash-attention kernels on hardware first.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def build(preset: str, batch: int, scheduler: str = "ddim",
          steps: int = None, deep_cache: bool = False,
          cache_interval: int = 3, guidance_type: str = "transform_guidance",
          int8: bool = False, step_in_plan: bool = False):
    import dataclasses

    from distdiff_tpu.config import GuidanceConfig, PipelineConfig
    from distdiff_tpu.models.guide import create_model
    from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig

    if preset == "tiny":
        config = PipelineConfig.tiny(sample_size=32)
        guide = create_model("tiny_resnet", num_classes=4, input_size=32,
                             lazy_init=True)
        gcfg = GuidanceConfig(
            guidance_type="transform_guidance", guidance_step=4,
            guidance_period=2, K=3, guide_input_size=32,
        )
    elif preset == "sd21":
        # SD-2.1 768-v guided expansion (beyond-reference model family):
        # v-prediction DDIM, head_dim-64 attention, OpenCLIP-H 1024-d
        # context — same transform_guidance recipe as sd15.
        config = PipelineConfig.sd21()
        guide = create_model("resnet50", num_classes=100, input_size=224,
                             lazy_init=True)
        gcfg = GuidanceConfig()
    else:
        config = PipelineConfig.sd15()
        guide = create_model("resnet50", num_classes=100, input_size=224,
                             lazy_init=True)
        gcfg = GuidanceConfig()  # reference defaults (expand_diff.sh)

    if guidance_type != "transform_guidance":
        gcfg = dataclasses.replace(gcfg, guidance_type=guidance_type)
    if step_in_plan:
        gcfg = dataclasses.replace(gcfg, step_in_plan=True)
    if scheduler != "ddim":
        config = dataclasses.replace(config, scheduler=scheduler)
    if steps is not None:
        # non-default step plans: the guidance window (guidance_step=20
        # from the END) clamps to the img2img start exactly like the CLI
        config = dataclasses.replace(config, num_inference_steps=steps)
    if deep_cache:
        config = dataclasses.replace(config, deep_cache=True,
                                     cache_interval=cache_interval)
    if int8:
        config = dataclasses.replace(config, int8=True)
    rng = np.random.RandomState(0)
    gp = rng.randn(guide.num_classes, guide.feature_dim).astype(np.float32)
    lp = rng.randn(guide.num_classes, gcfg.K, guide.feature_dim).astype(np.float32)
    pipe = ExpansionPipeline.create(
        config,
        sampler_cfg=SamplerConfig(guidance_scale=7.5),
        guidance_cfg=gcfg,
        guide=guide,
        global_protos=gp,
        local_protos=lp,
        strength=0.5,
        lazy_params=True,
    )
    ls = config.latent_size
    lat = jnp.asarray(rng.randn(batch, ls, ls, 4), jnp.float32) * 0.18
    cond = jnp.asarray(
        rng.randn(batch, config.text_encoder.max_length,
                  config.unet.cross_attention_dim), jnp.float32)
    uncond = jnp.asarray(
        rng.randn(batch, config.text_encoder.max_length,
                  config.unet.cross_attention_dim), jnp.float32)
    targets = jnp.asarray(rng.randint(0, guide.num_classes, batch))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(batch))
    return pipe, (pipe.full_params(), lat, cond, uncond, targets, keys)


def build_sdxl_guided(batch: int, sample_size: int,
                      guidance_type: str = "transform_guidance",
                      int8: bool = False):
    """SDXL-base GUIDED expansion (beyond-reference flagship recipe): the
    DistDiff transform_guidance img2img loop on the SDXL geometry — DDIM-50,
    strength 0.5, CFG, guidance through 2 UNet forwards + 1024^2 VAE decode
    + ResNet-50. Conditioning comes from the real-geometry dual text towers
    (encoded on device in setup — the pipeline caches per-class embeds, so
    tower time is not steady-state cost; ids -> {ctx, add} runs the full
    towers once here)."""
    from distdiff_tpu.config import GuidanceConfig, PipelineConfig
    from distdiff_tpu.models.guide import create_model
    from distdiff_tpu.sampling import ExpansionPipeline, SamplerConfig

    from distdiff_tpu.models import AutoencoderKL, CLIPTextEncoder, UNet2DCondition
    from distdiff_tpu.sampling.pipeline import _unet_init_args

    config = PipelineConfig.sdxl_base(sample_size=sample_size)
    if int8:
        import dataclasses as _dc

        config = _dc.replace(config, int8=True)
    guide = create_model("resnet50", num_classes=100, input_size=224,
                         lazy_init=True)
    rng = np.random.RandomState(0)
    gp = rng.randn(guide.num_classes, guide.feature_dim).astype(np.float32)
    lp = rng.randn(guide.num_classes, 3, guide.feature_dim).astype(np.float32)

    # bf16 constant-filled params straight from eval_shape: materializing
    # the 2.57B UNet leaves fp32 (10.3GB) OOMs a v5e-1 before the bench can
    # even cast (values are irrelevant to throughput)
    def fill(shapes):
        return jax.tree.map(
            lambda s: jnp.full(
                s.shape, 0.02,
                jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype), shapes)

    key = jax.random.PRNGKey(0)
    unet = UNet2DCondition(config.unet)
    vae = AutoencoderKL(config.vae)
    te1 = CLIPTextEncoder(config.text_encoder)
    te2 = CLIPTextEncoder(config.text_encoder_2)
    uargs = _unet_init_args(config)
    img0 = jnp.zeros((1, config.sample_size, config.sample_size, 3), jnp.float32)
    params = {
        "unet": fill(jax.eval_shape(unet.init, key, *uargs)["params"]),
        "vae": fill(jax.eval_shape(vae.init, key, img0)["params"]),
    }
    tl = config.text_encoder.max_length
    ids0 = jnp.zeros((1, tl), jnp.int32)
    text_params = {
        "text": fill(jax.eval_shape(te1.init, key, ids0)["params"]),
        "text_2": fill(jax.eval_shape(te2.init, key, ids0)["params"]),
    }
    pipe = ExpansionPipeline.create(
        config,
        sampler_cfg=SamplerConfig(guidance_scale=7.5),
        guidance_cfg=GuidanceConfig(guidance_type=guidance_type),
        params={**params, **text_params},
        guide=guide, global_protos=gp, local_protos=lp,
        strength=0.5,
    )
    ls = config.latent_size
    lat = jnp.asarray(rng.randn(batch, ls, ls, 4), jnp.float32) * 0.13
    ids = jnp.asarray(rng.randint(1, 49000, (batch, tl)), jnp.int32)
    uids = jnp.zeros_like(ids)
    # params as ARG (a closure would capture the towers as 3.2GB of
    # lowered constants); towers freed from HBM right after
    encode = jax.jit(pipe.encode_text_pair)
    cond = jax.tree.map(jnp.asarray, encode(text_params, ids, ids))
    uncond = jax.tree.map(jnp.asarray, encode(text_params, uids, uids))
    jax.block_until_ready((cond, uncond))
    for leaf in jax.tree.leaves(text_params):
        leaf.delete()
    targets = jnp.asarray(rng.randint(0, guide.num_classes, batch))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(batch))
    params["guide"] = pipe.guide.variables
    return pipe, (params, lat, cond, uncond, targets, keys)


def build_sdxl(batch: int, sample_size: int, int8: bool = False):
    """SDXL-base text-to-image step (no DistDiff guidance — the reference
    recipe is SD-1.x; this preset tracks the framework's flagship-model
    throughput). Returns (sample_fn, args)."""
    from distdiff_tpu.config import PipelineConfig
    from distdiff_tpu.sampling.sdxl import SDXLPipeline, default_time_ids

    config = PipelineConfig.sdxl_base(sample_size=sample_size)
    if int8:
        import dataclasses as _dc

        config = _dc.replace(config, int8=True)
    pipe = SDXLPipeline.create(config, lazy_params=True)
    rng = np.random.RandomState(0)
    ls = config.latent_size
    lat = jnp.asarray(rng.randn(batch, ls, ls, 4), jnp.float32)
    d = config.unet.cross_attention_dim
    ctx = jnp.asarray(rng.randn(batch, 77, d), jnp.float32)
    uctx = jnp.asarray(rng.randn(batch, 77, d), jnp.float32)
    pooled = jnp.asarray(
        rng.randn(batch, config.text_encoder_2.embed_dim), jnp.float32)
    add = pipe.added_cond(pooled)
    uadd = pipe.added_cond(jnp.zeros_like(pooled))
    # only the sampling path's components (text towers stay off-device)
    params = {"unet": pipe.params["unet"], "vae": pipe.params["vae"]}
    sample = jax.jit(pipe.make_sample_fn(text_to_img=True))
    return sample, (params, lat, ctx, add, uctx, uadd, jax.random.PRNGKey(0))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset",
                   choices=["sd15", "tiny", "sd21", "sdxl", "sdxl_guided"],
                   default="sd15")
    p.add_argument("--batch", type=int, default=None,
                   help="images per step (default 8 for sd15/tiny, 2 for "
                        "sd21 [768^2], 1 for the sdxl presets; sd15 "
                        "throughput scales 1.04/1.21/1.43 img/s/chip at "
                        "1/4/8 on v5e-1)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--check", action="store_true",
                   help="validate flash attention on this backend first")
    p.add_argument("--fused", action="store_true",
                   help="benchmark the single fused program instead of the "
                        "split-program path (fused compiles MUCH slower on "
                        "remote-compile backends)")
    p.add_argument("--fp32_params", action="store_true",
                   help="keep parameters fp32 (default stores them bf16 to "
                        "halve weight-read bandwidth; activations math is "
                        "bf16 with fp32 statistics either way)")
    p.add_argument("--sdxl_size", type=int, default=1024,
                   help="--preset sdxl resolution")
    p.add_argument("--scheduler", default="ddim",
                   choices=["ddim", "dpmpp"],
                   help="sampling solver for the sd15/tiny/sd21 presets "
                        "(the OFFICIAL BASELINE.md metric is DDIM-50; dpmpp "
                        "is the beyond-reference DPM-Solver++(2M) datapoint)")
    p.add_argument("--steps", type=int, default=None,
                   help="override the inference step plan for the "
                        "sd15/tiny/sd21 presets (e.g. --scheduler dpmpp "
                        "--steps 25; official metric stays DDIM-50)")
    p.add_argument("--guide_chunk", type=int, default=None,
                   help="override the guidance-backward chunk size "
                        "(default: preset heuristic — sd15 chunks at 8 "
                        "beyond batch 8; must divide the batch)")
    p.add_argument("--decode_chunk", type=int, default=None,
                   help="override the tail denoise+decode span chunk "
                        "(default: sd21 chunks at 2 beyond batch 2 — the "
                        "768^2 decode OOMs a v5e-1 at batch 4)")
    p.add_argument("--deep_cache", action="store_true",
                   help="DeepCache datapoint (approximate; NOT the "
                        "official metric)")
    p.add_argument("--cache_interval", type=int, default=3)
    p.add_argument("--guidance_step_in_plan", action="store_true",
                   help="shift the guidance window into short step plans "
                        "instead of the reference's silent unguided clamp "
                        "(pipeline._clamp_window step_in_plan)")
    p.add_argument("--int8", action="store_true",
                   help="w8a8 int8 UNet denoise spans (ops/quant.py; "
                        "guidance steps stay exact bf16; approximate, "
                        "NOT the official metric)")
    p.add_argument("--guidance_type", default="transform_guidance",
                   choices=["transform_guidance", "direct_guidance"],
                   help="the official metric is transform_guidance; "
                        "direct_guidance descends on the latent at EVERY "
                        "window step (reference generate_data.py:735-767)")
    args = p.parse_args()
    if args.batch is None:
        # sd21: batch 4 OOMs in the final 768^2 decode span on v5e-1
        # (~= a 512^2 batch-9 activation footprint, just over HBM)
        # sdxl t2i: batch 2 measured 0.191 vs batch 1's 0.181 img/s/chip
        # on v5e-1 (amortizes per-step dispatch overhead).
        args.batch = {"sdxl": 2, "sdxl_guided": 1, "sd21": 2}.get(
            args.preset, 8)

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)

    if args.check:
        from distdiff_tpu.ops.attention import xla_attention
        from distdiff_tpu.ops.flash import flash_attention

        r = np.random.RandomState(0)
        q = jnp.asarray(r.randn(1, 1024, 8, 40), jnp.float32)
        k = jnp.asarray(r.randn(1, 77, 8, 40), jnp.float32)
        v = jnp.asarray(r.randn(1, 77, 8, 40), jnp.float32)
        err = float(jnp.abs(flash_attention(q, k, v) - xla_attention(q, k, v)).max())
        print(f"flash-attention check: max err {err:.2e}", file=sys.stderr)
        assert err < 1e-2

    if args.preset == "sdxl":
        sample, sargs = build_sdxl(args.batch, args.sdxl_size,
                                   int8=args.int8)
        t0 = time.time()
        out = sample(*sargs)
        float(jnp.sum(out))  # host VALUE fetch (see guided loop note)
        print(f"compile+first-run: {time.time() - t0:.1f}s", file=sys.stderr)
        # t2i draws its initial noise from the PRNG key (the latents arg is
        # shape-only), so vary the KEY per iteration — the remote tunnel may
        # elide value-identical dispatches (CLAUDE.md varied-input rule).
        *head, key0 = sargs
        times = []
        for i in range(args.iters):
            key_i = jax.random.fold_in(key0, i + 1)
            key_i.block_until_ready()
            t0 = time.time()
            out = sample(*head, key_i)
            float(jnp.sum(out))
            times.append(time.time() - t0)
        dt = min(times)
        ips = args.batch / dt
        print(f"steady-state: {dt:.3f}s/batch of {args.batch} "
              f"({ips:.3f} img/s/chip)", file=sys.stderr)
        # vs_baseline: the 2.0 north star is the SD-1.5 512^2 guided recipe;
        # no published SDXL baseline exists for this rig, so omit the ratio.
        print(json.dumps({
            "metric": (f"images/sec/chip (SDXL-base DDIM-50 "
                       f"{args.sdxl_size}^2, CFG t2i)"
                       + (" [int8 spans]" if args.int8 else "")),
            "value": round(ips, 4), "unit": "img/s/chip",
            "vs_baseline": None,
        }))
        return

    if args.preset == "sdxl_guided":
        pipe, bench_args = build_sdxl_guided(args.batch, args.sdxl_size,
                                             guidance_type=args.guidance_type,
                                             int8=args.int8)
    else:
        pipe, bench_args = build(args.preset, args.batch,
                                 scheduler=args.scheduler, steps=args.steps,
                                 deep_cache=args.deep_cache,
                                 cache_interval=args.cache_interval,
                                 guidance_type=args.guidance_type,
                                 int8=args.int8,
                                 step_in_plan=args.guidance_step_in_plan)
    # A short --steps plan (or low strength) can clamp the guidance window
    # out of the executed range — reference-parity silent-unguided behavior
    # (pipeline._clamp_window). Label the metric honestly when that happens.
    # Guard on the CONFIGURED type: guidance_active() is also False for a
    # deliberately-unguided pipeline ("none"), which must not be tagged as
    # "clamped" (argparse currently forbids it here, but keep the check
    # type-driven like cli/generate_data.py's).
    wants_guidance = pipe.guidance_cfg.guidance_type in (
        "transform_guidance", "direct_guidance")
    window_clamped = wants_guidance and not pipe.guidance_active()
    if window_clamped:
        print("WARNING: guidance window falls before the img2img start "
              "index under this step plan/strength — this run is "
              "effectively UNGUIDED (reference-parity clamp; see "
              "sampling/pipeline.py:_clamp_window)", file=sys.stderr)
    if not args.fp32_params:
        from distdiff_tpu.sampling.pipeline import cast_params_bf16

        full, *rest = bench_args
        bench_args = (cast_params_bf16(full),) + tuple(rest)
    if args.fused:
        expand = jax.jit(pipe.make_expand_fn())
    else:
        # chunk the guidance backward: its remat'd rollout is the HBM peak;
        # the denoise spans alone scale to larger batches. SD-1.5: chunk at
        # 8 beyond batch 8. SDXL guided: batch 2 misses HBM by only ~59MB
        # unchunked (15.81/15.75G), so chunk at 1 beyond batch 1.
        if args.guide_chunk is not None:
            chunk = args.guide_chunk if args.guide_chunk < args.batch else None
        elif args.preset == "sdxl_guided":
            chunk = 1 if args.batch > 1 else None
        elif args.preset == "sd21":
            # 768^2 guidance rollout is ~2.25x the 512^2 activation
            # footprint at the same param size — chunk beyond batch 4
            chunk = 4 if args.batch > 4 else None
        else:
            chunk = 8 if args.batch > 8 else None
        if args.decode_chunk is not None:
            dchunk = args.decode_chunk if args.decode_chunk < args.batch \
                else None
        elif args.preset == "sd21":
            dchunk = 2 if args.batch > 2 else None
        else:
            dchunk = None
        expand = pipe.make_split_expand(guide_chunk=chunk,
                                        decode_chunk=dchunk)

    t0 = time.time()
    out = expand(*bench_args)
    float(jnp.sum(out))  # host VALUE fetch — see timing loop below
    compile_s = time.time() - t0
    print(f"compile+first-run: {compile_s:.1f}s", file=sys.stderr)

    # Distinct latents per iteration: the serving tunnel caches executions
    # with identical argument values, which would fake the repeat timings.
    # Each iteration ends with a host fetch of a reduction over the FULL
    # output: block_until_ready does not reliably wait on this tunnel
    # (multi-dispatch chunked paths returned in ~0.02s), but a value
    # transfer cannot complete before every producing dispatch has run.
    params_, lat0, cond_, uncond_, targets_, keys_ = bench_args
    times = []
    for i in range(args.iters):
        lat_i = lat0 + jnp.float32(1e-6 * (i + 1))
        lat_i.block_until_ready()
        t0 = time.time()
        out = expand(params_, lat_i, cond_, uncond_, targets_, keys_)
        float(jnp.sum(out))
        times.append(time.time() - t0)
    dt = min(times)
    n_dev = 1  # bench runs the whole batch on one chip
    ips = args.batch / dt / n_dev
    print(
        f"steady-state: {dt:.3f}s/batch of {args.batch} "
        f"({ips:.3f} img/s/chip)", file=sys.stderr,
    )
    gt = args.guidance_type
    metric = {
        "sd15": f"guided images/sec/chip (SD-1.5 DDIM-50 512^2, {gt})",
        "tiny": "guided images/sec/chip (tiny preset)",
        "sd21": f"guided images/sec/chip (SD-2.1 768-v DDIM-50, {gt})",
        "sdxl_guided": f"guided images/sec/chip (SDXL-base DDIM-50 "
                       f"{args.sdxl_size}^2, {gt})",
    }[args.preset]
    official = (args.preset in ("sd15", "tiny")
                and args.scheduler == "ddim" and args.steps is None
                and not args.deep_cache and not args.int8
                and not args.guidance_step_in_plan
                and args.guidance_type == "transform_guidance")
    if args.scheduler != "ddim":
        metric += f" [{args.scheduler}]"
    if args.steps is not None:
        metric += f" [steps={args.steps}]"
    if args.deep_cache:
        metric += f" [deepcache@{args.cache_interval}]"
    if args.int8:
        metric += " [int8 spans]"
    if args.guidance_step_in_plan:
        metric += " [window shifted in-plan]"
    if window_clamped:
        metric += " [guidance window clamped: UNGUIDED]"
    print(json.dumps({
        "metric": metric,
        "value": round(ips, 4),
        "unit": "img/s/chip",
        # the 2.0 north star is the SD-1.5 512^2 DDIM-50 recipe; no
        # published baseline exists for other schedulers/geometries
        "vs_baseline": round(ips / 2.0, 4) if official else None,
    }))


if __name__ == "__main__":
    main()
