from distdiff_tpu.models.text_encoder import CLIPTextEncoder
from distdiff_tpu.models.tokenizer import CLIPTokenizer, HashTokenizer, load_tokenizer
from distdiff_tpu.models.unet import UNet2DCondition
from distdiff_tpu.models.vae import AutoencoderKL

__all__ = [
    "UNet2DCondition",
    "AutoencoderKL",
    "CLIPTextEncoder",
    "CLIPTokenizer",
    "HashTokenizer",
    "load_tokenizer",
]
