from distdiff_tpu.models.guide.clip_vit import CLIPViT, CLIPViTConfig, zero_shot_logits
from distdiff_tpu.models.guide.factory import ARCHS, GuideModel, create_model, load_weights
from distdiff_tpu.models.guide.mobilenet import MobileNetV2, MobileNetV2Config
from distdiff_tpu.models.guide.resnet import (
    ResNet,
    ResNetConfig,
    resnet50_config,
    resnext50_config,
    tiny_resnet_config,
    wideresnet50_config,
)

__all__ = [
    "ARCHS",
    "GuideModel",
    "create_model",
    "load_weights",
    "ResNet",
    "ResNetConfig",
    "resnet50_config",
    "resnext50_config",
    "wideresnet50_config",
    "tiny_resnet_config",
    "MobileNetV2",
    "MobileNetV2Config",
    "CLIPViT",
    "CLIPViTConfig",
    "zero_shot_logits",
]
