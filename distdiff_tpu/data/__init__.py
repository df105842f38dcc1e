from distdiff_tpu.data.datasets import (
    ArrayDataset,
    BatchLoader,
    ConcatDataset,
    DatasetByClassNames,
    ImageListDataset,
    RepeatDataset,
    SubsetDataset,
    load_image,
)
from distdiff_tpu.data.registry import DATASETS, LoadedDataset, load_dataset
from distdiff_tpu.data.sd_dataset import SDDataset, SDItem, collate_sd
from distdiff_tpu.data.templates import CUSTOM_TEMPLATES, template_for
from distdiff_tpu.data import transforms

__all__ = [
    "ArrayDataset",
    "BatchLoader",
    "ConcatDataset",
    "DatasetByClassNames",
    "ImageListDataset",
    "RepeatDataset",
    "SubsetDataset",
    "load_image",
    "DATASETS",
    "LoadedDataset",
    "load_dataset",
    "SDDataset",
    "SDItem",
    "collate_sd",
    "CUSTOM_TEMPLATES",
    "template_for",
    "transforms",
]
