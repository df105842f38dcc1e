from distdiff_tpu.train.augment.augmix import (
    AugMixDataset,
    augment_and_mix,
    jsd_consistency_loss,
)
from distdiff_tpu.train.augment.cutmix import (
    cutmix_data,
    rand_bbox,
    soft_target_cross_entropy,
)
from distdiff_tpu.train.augment.gridmask import GridMask
from distdiff_tpu.train.augment.mixup import mixup_criterion, mixup_data
from distdiff_tpu.train.augment.pil_ops import (
    AUGMENTATIONS,
    AUGMENTATIONS_ALL,
    AutoAugmentCIFAR,
    Cutout,
    RandAugment,
)

__all__ = [
    "AugMixDataset",
    "augment_and_mix",
    "jsd_consistency_loss",
    "cutmix_data",
    "rand_bbox",
    "soft_target_cross_entropy",
    "GridMask",
    "mixup_data",
    "mixup_criterion",
    "AUGMENTATIONS",
    "AUGMENTATIONS_ALL",
    "RandAugment",
    "AutoAugmentCIFAR",
    "Cutout",
]
