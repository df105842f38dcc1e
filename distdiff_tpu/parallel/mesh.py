"""Device mesh helpers.

The reference parallelizes generation by launching one OS process per GPU
with ``CUDA_VISIBLE_DEVICES``/``--split`` (``scripts/exps/expand_diff.sh:
19-24``). Here a single process drives all chips: a 1-D ``data`` mesh over
the slice, batch axis sharded, parameters replicated — XLA handles placement
and there is nothing to communicate during expansion (it is embarrassingly
parallel). Downstream training reuses the same mesh with psum gradients.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded across the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
