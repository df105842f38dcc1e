"""Pipeline parallelism for the diffusion UNet (stage-partitioned serving).

The reference has no model parallelism at all (SURVEY §2.7 — its workload
is embarrassingly data-parallel across GPUs); like ``parallel/tp.py`` and
``parallel/sp.py`` this is TPU-native framework surface beyond it. PP is
the memory axis TP does not cover well on this model family: the UNet's
parameter bulk lives in convolutions (which TP deliberately replicates —
``tp.py``), so sharding *stages* of the network across devices divides
total parameter + optimizer memory per chip and lets a geometry that does
not fit one chip serve at full ICI bandwidth.

Design (host-driven GPipe-style inference pipeline):

  * ``UNet2DCondition.__call__(segment=(a, b), skips=...)`` runs a
    contiguous slice of the linear *unit list* (conv_in, N down levels,
    mid, N up groups, conv_out — ``models/unet.py``). Parameter names are
    position-independent strings, so a stage's parameters are a plain
    subtree of the full tree: one converted checkpoint serves 1-stage and
    S-stage layouts identically.
  * ``split_unet_params`` cuts the tree at unit boundaries chosen by a
    min-max-cost DP over per-unit parameter bytes (``plan_boundaries``) —
    stages are balanced by weight memory, the thing PP shards.
  * Each stage is jitted once with a static ``segment`` and its parameters
    are placed on that stage's device group (``jax.device_put``; within a
    group, activations shard batch-wise — PP×DP composes). The carried
    state between stages is ``(hidden, skips)``; skip tensors produced by
    early down levels are consumed by the *matching* up group, so they
    flow through intermediate stages as part of the carry — on hardware
    these hops ride ICI.
  * JAX dispatch is asynchronous: ``PipelinedUNet.microbatched`` enqueues
    ``M`` microbatches depth-first and the per-device execution queues
    overlap — stage s runs microbatch m while stage s-1 runs m+1, the
    classic GPipe fill/drain, with no custom scheduler. The denoise loop
    drives one pipeline pass per DDIM step (host-driven serving path; the
    single-chip jitted ``fori_loop`` path stays the throughput default).

Exercised on the 8-virtual-device CPU mesh in ``tests/test_parallel_pp.py``
and by ``__graft_entry__.dryrun_multichip``'s pp segment.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from distdiff_tpu.parallel.mesh import DATA_AXIS

# Parameters every stage needs: the timestep MLP feeds every resnet, and
# the SDXL additive-conditioning MLP adds into the same embedding. Tiny
# (<0.5% of the tree) — replicated across stages.
_SHARED = ("time_embedding", "add_embedding")


def n_units(n_blocks: int) -> int:
    return 2 * n_blocks + 3


def unit_of_param(name: str, n_blocks: int) -> Optional[int]:
    """Pipeline unit owning a top-level UNet param collection.

    ``None`` means shared-by-all-stages (see ``_SHARED``).
    """
    if name in _SHARED:
        return None
    if name == "conv_in":
        return 0
    if name.startswith("down_"):
        return 1 + int(name.split("_")[1])
    if name.startswith("mid_"):
        return n_blocks + 1
    if name.startswith("up_"):
        return n_blocks + 2 + int(name.split("_")[1])
    if name in ("conv_norm_out", "conv_out"):
        return 2 * n_blocks + 2
    raise ValueError(f"unknown UNet param collection: {name!r}")


def _param_bytes(tree: Any) -> int:
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree))


def plan_boundaries(params: Any, n_blocks: int, n_stages: int,
                    ) -> List[Tuple[int, int]]:
    """Contiguous unit ranges minimizing the max per-stage parameter bytes.

    Exact DP (units <= 2N+3 ~ 19, stages <= chips — trivial sizes).
    """
    top = params.get("params", params)
    nu = n_units(n_blocks)
    cost = [0] * nu
    for name, sub in top.items():
        u = unit_of_param(name, n_blocks)
        if u is not None:
            cost[u] += _param_bytes(sub)
    prefix = np.concatenate([[0], np.cumsum(cost)])

    def span(a, b):  # cost of units [a, b)
        return prefix[b] - prefix[a]

    INF = float("inf")
    # best[s][b] = minimal max-stage-cost splitting units [0, b) into s stages
    best = [[INF] * (nu + 1) for _ in range(n_stages + 1)]
    cut = [[0] * (nu + 1) for _ in range(n_stages + 1)]
    best[0][0] = 0.0
    for s in range(1, n_stages + 1):
        for b in range(s, nu + 1):
            for a in range(s - 1, b):
                v = max(best[s - 1][a], span(a, b))
                if v < best[s][b]:
                    best[s][b], cut[s][b] = v, a
    bounds, b = [], nu
    for s in range(n_stages, 0, -1):
        a = cut[s][b]
        bounds.append((a, b))
        b = a
    bounds.reverse()
    assert bounds[0][0] == 0 and bounds[-1][1] == nu
    return bounds


def split_unet_params(params: Any, boundaries: Sequence[Tuple[int, int]],
                      n_blocks: int) -> List[Any]:
    """Per-stage param subtrees (shared collections replicated into each)."""
    wrapped = "params" in params
    top = params["params"] if wrapped else params
    stages = []
    for a, b in boundaries:
        sub = {
            name: v for name, v in top.items()
            if unit_of_param(name, n_blocks) is None
            or a <= unit_of_param(name, n_blocks) < b
        }
        stages.append({"params": sub} if wrapped else sub)
    return stages


class PipelinedUNet:
    """UNet forward partitioned into S stages across S device groups.

    ``devices``: flat device list split evenly into stage groups (default
    ``jax.devices()``). Within a group, activations shard on the batch
    axis and stage params replicate — PP×DP. One jitted program per stage
    (static ``segment``); stage params live on their group only.
    """

    def __init__(self, unet, params: Any, n_stages: int = 2,
                 devices: Optional[Sequence] = None,
                 boundaries: Optional[Sequence[Tuple[int, int]]] = None):
        devices = list(devices) if devices is not None else jax.devices()
        assert n_stages >= 1 and len(devices) >= n_stages
        cfg = unet.config
        nb = len(cfg.block_out_channels)
        self.unet = unet
        self.n_stages = n_stages
        self.boundaries = list(boundaries) if boundaries is not None else \
            plan_boundaries(params, nb, n_stages)
        assert len(self.boundaries) == n_stages
        per = len(devices) // n_stages
        groups = [devices[i * per:(i + 1) * per] for i in range(n_stages)]
        self.meshes = [Mesh(np.asarray(g), (DATA_AXIS,)) for g in groups]
        self.batch_shardings = [NamedSharding(m, P(DATA_AXIS))
                                for m in self.meshes]
        self.repl_shardings = [NamedSharding(m, P()) for m in self.meshes]
        stage_params = split_unet_params(params, self.boundaries, nb)
        self.stage_params = [
            jax.device_put(sp, self.repl_shardings[i])
            for i, sp in enumerate(stage_params)
        ]
        nu = n_units(nb)

        def make_stage(seg):
            final = seg[1] == nu

            def fn(p, x, skips, t, ctx, added):
                kw = {} if added is None else {"added_cond": added}
                return unet.apply(p, x, t, ctx, segment=seg, skips=skips,
                                  **kw)

            return jax.jit(fn, static_argnames=()), final

        self._stages = [make_stage(seg) for seg in self.boundaries]

    def _to_stage(self, i: int, tree: Any, sharded_batch: bool) -> Any:
        leaves = jax.tree_util.tree_leaves(tree)
        if not leaves:
            return tree
        group = self.meshes[i].devices.size
        if sharded_batch and leaves[0].shape[0] % group:
            # microbatch smaller than the stage's data group: replicate
            # in-group rather than fail the divisibility check
            sharded_batch = False
        sh = self.batch_shardings[i] if sharded_batch else \
            self.repl_shardings[i]
        return jax.device_put(tree, jax.tree_util.tree_map(
            lambda _: sh, tree))

    def __call__(self, sample, timestep, context, added_cond=None):
        x, skips = sample, ()
        t = jnp.atleast_1d(jnp.asarray(timestep))
        for i, (fn, final) in enumerate(self._stages):
            x = self._to_stage(i, x, True)
            skips = self._to_stage(i, skips, True)
            ti = self._to_stage(i, t, False)
            ci = self._to_stage(i, context, True)
            ai = None if added_cond is None else \
                self._to_stage(i, added_cond, True)
            out = fn(self.stage_params[i], x, skips, ti, ci, ai)
            if final:
                return out
            x, skips = out

    def microbatched(self, sample, timestep, context, added_cond=None,
                     n_micro: int = None):
        """Split the batch into microbatches and enqueue them depth-first;
        async dispatch overlaps stages (GPipe fill/drain for free)."""
        b = sample.shape[0]
        n_micro = n_micro or self.n_stages
        assert b % n_micro == 0, (b, n_micro)
        mb = b // n_micro
        outs = []
        for m in range(n_micro):
            sl = slice(m * mb, (m + 1) * mb)
            a = None if added_cond is None else added_cond[sl]
            outs.append(self(sample[sl], timestep, context[sl], a))
        # outputs are already committed to the final stage's device group
        return jnp.concatenate(outs, axis=0)
