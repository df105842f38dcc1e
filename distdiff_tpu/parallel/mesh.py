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


def make_expand_mesh(n_model: int = 1,
                     devices: Optional[Sequence] = None) -> Mesh:
    """Expansion mesh: the default 1-D ``data`` mesh, or (``n_model > 1``)
    a 2-D ``data x model`` mesh for tensor-parallel expansion — each model
    group shards one UNet Megatron-style (parallel/tp.py) so HBM-starved
    recipes (SDXL-guided batch 2 on a v5e-1) fit by splitting the
    transformer weights/activations across ``n_model`` chips."""
    devices = list(devices) if devices is not None else jax.devices()
    if n_model <= 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    from distdiff_tpu.parallel.tp import make_tp_mesh

    assert len(devices) % n_model == 0, (
        f"--mesh_model {n_model} does not divide {len(devices)} devices")
    return make_tp_mesh(len(devices) // n_model, n_model, devices=devices)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded across the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
