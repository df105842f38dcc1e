from distdiff_tpu.prototypes.cluster import agglomerative_average
from distdiff_tpu.prototypes.extract import (
    build_prototypes,
    extract_features,
    load_prototypes,
    normalize_prototypes,
    save_prototypes,
)

__all__ = [
    "agglomerative_average",
    "extract_features",
    "build_prototypes",
    "normalize_prototypes",
    "save_prototypes",
    "load_prototypes",
]
