from distdiff_tpu.guidance.energy import (
    global_energy,
    hierarchical_energy,
    local_energy,
    normalize,
)
from distdiff_tpu.guidance.optimize import (
    GuidanceContext,
    direct_guidance,
    direct_guidance_step,
    transform_guidance,
)

__all__ = [
    "hierarchical_energy",
    "global_energy",
    "local_energy",
    "normalize",
    "GuidanceContext",
    "transform_guidance",
    "direct_guidance",
    "direct_guidance_step",
]
