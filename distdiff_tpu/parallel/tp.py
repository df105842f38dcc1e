"""Tensor-parallel sharding rules for the diffusion UNet (GSPMD).

The reference has no model parallelism (its UNet fits one GPU and the
workload is embarrassingly data-parallel — SURVEY §2.7). This module is
TPU-native framework surface beyond the reference: annotate the parameter
tree with `PartitionSpec`s over a 2-D ``('data', 'model')`` mesh and let
XLA's GSPMD partitioner insert the collectives. The transformer weights —
the parameter bulk of the SD UNet — shard Megatron-style:

  * attention to_q/to_k/to_v and ff's first Dense: column-parallel
    (``P(None, 'model')``) — each chip holds a head/neuron slice;
  * attention to_out and ff's second Dense: row-parallel
    (``P('model', None)``) — GSPMD inserts ONE all-reduce per block pair,
    riding ICI;
  * convs, norms, embeddings: replicated (channel-sharded convs would need
    halo exchanges for a small fraction of the FLOPs — not worth it at SD
    sizes).

Use ``unet_param_shardings(mesh, params)`` to build the sharding tree and
pass it to ``jax.jit``'s ``in_shardings`` (or ``jax.device_put``). Works
for any batch size divisible by the 'data' axis; exercised on an 8-device
CPU mesh in ``tests/test_parallel_tp.py`` and by ``dryrun_multichip``.

The Pallas flash-attention kernel is a custom call GSPMD cannot partition;
under TP it is wrapped in ``jax.shard_map`` instead — enter
``distdiff_tpu.ops.attention.tp_sharded_attention(mesh)`` around the jit of
a TP program and each device runs the kernel on its local
``[B/nd, T, H/nm, D]`` block (attention is per-(batch, head) independent:
no collectives inside; the row-parallel ``to_out`` all-reduce behind it is
GSPMD's, as before). Forward AND the custom-VJP backward compose
(``tests/test_parallel_tp.py``). ``DISTDIFF_FORCE_XLA_ATTENTION=1`` remains
as an escape hatch only.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"
DATA_AXIS = "data"

# Dense kernels inside TransformerBlock that shard column-parallel
# ([in, out] -> out sharded) and row-parallel ([in, out] -> in sharded).
_COL_PARALLEL = ("to_q", "to_k", "to_v", "net_0")   # qkv + GEGLU proj
_ROW_PARALLEL = ("to_out", "net_2")                 # out proj + ff down


def make_tp_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    import numpy as np

    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_model, (len(devices), n_data, n_model)
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _spec_for(path) -> P:
    names = [p.key for p in path if hasattr(p, "key")]
    inside_transformer = any(n.startswith("transformer_blocks") for n in names)
    if inside_transformer and names[-1] == "kernel":
        parent = names[-2] if len(names) >= 2 else ""
        if any(parent == c or parent.startswith(c) for c in _COL_PARALLEL):
            return P(None, MODEL_AXIS)
        if any(parent == r or parent.startswith(r) for r in _ROW_PARALLEL):
            return P(MODEL_AXIS, None)
    if inside_transformer and names[-1] == "bias":
        parent = names[-2] if len(names) >= 2 else ""
        if any(parent == c or parent.startswith(c) for c in _COL_PARALLEL):
            return P(MODEL_AXIS)
    return P()  # replicated


def unet_param_shardings(mesh: Mesh, params: Any) -> Any:
    """PartitionSpec tree for a UNet (or any tree using our transformer
    naming); pairs with ``NamedSharding`` over the given mesh."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, _spec_for(path)), params
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
