"""distdiff_tpu — TPU-native, distribution-aware dataset expansion.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DistDiff
(haoweiz23/DistDiff, NeurIPS 2024): training-free dataset expansion with a
Stable Diffusion img2img DDIM loop and hierarchical prototype energy guidance,
plus the downstream train/eval harness that measures the accuracy gain.

Layering (see SURVEY.md §7):
  schedulers/  — DDIM as a stateless pytree
  models/      — Flax UNet2DCondition, AutoencoderKL, CLIP text encoder,
                 guide classifiers (ResNet/ResNeXt/WRN/MobileNetV2/CLIP-ViT)
  ops/         — Pallas flash attention + fused kernels (the native layer)
  sampling/    — jit-compiled img2img/text2img samplers with CFG
  guidance/    — hierarchical energy guidance via jax.grad through UNet+VAE
  prototypes/  — guide-feature extraction + agglomerative clustering
  data/        — dataset registry, SD dataset w/ latent+text-embed caching
  parallel/    — device mesh, sharded expansion driver, work manifest
  train/       — downstream classifier trainers + augmentation library
  cli/         — reference-compatible command-line entry points
"""

__version__ = "0.1.0"
