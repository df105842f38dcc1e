from distdiff_tpu.sampling.pipeline import ExpansionPipeline, init_params
from distdiff_tpu.sampling.sampler import (
    SamplerConfig,
    denoise_range,
    img2img_init,
    make_eps_fn,
    sample,
    text2img_init,
)

__all__ = [
    "ExpansionPipeline",
    "init_params",
    "SamplerConfig",
    "make_eps_fn",
    "denoise_range",
    "sample",
    "img2img_init",
    "text2img_init",
]
