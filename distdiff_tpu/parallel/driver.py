"""Sharded expansion driver: manifest -> device batches -> PNGs.

Replaces the reference's per-GPU process fan-out + eager loop
(``generate_data.py:1130-1245`` + ``scripts/exps/expand_diff.sh``): one
process, a jitted expand program with the batch axis sharded over the mesh,
per-work-unit PRNG keys (outputs independent of shard count), async PNG
writeback on a thread pool overlapping the next device step.
"""

from __future__ import annotations

import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from distdiff_tpu.parallel.manifest import WorkUnit, build_manifest, chunk_units
from distdiff_tpu.parallel.mesh import data_sharding, make_mesh, replicated

log = logging.getLogger("distdiff.driver")


def save_png(path: str, image01: np.ndarray) -> None:
    """image01: [H, W, 3] float in [0, 1] -> 8-bit PNG.

    compress_level=1: zlib level 9 costs ~5x more CPU per 512^2 image and
    the writeback thread pool shares the host CPU with batch prep — at
    multi-img/s sustained rates PNG encoding becomes the host bottleneck.
    """
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.clip(np.asarray(image01) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path, compress_level=1)


class ExpansionDriver:
    """Runs guided expansion over a manifest of (image, image_i) work units.

    ``expand_fn(params, latents, cond, uncond, targets, keys) -> images01``
    is the pipeline's compiled hot path; the driver shards its batch axis.
    """

    def __init__(
        self,
        expand_fn: Callable,
        params,
        sd_dataset,                      # SDDataset
        output_dir: str,
        per_device_batch: int = 1,
        seed: int = 0,
        mesh=None,
        writer_threads: int = 4,
        prejitted: bool = False,
        param_shardings=None,
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = self.mesh.devices.size
        # Batch shards over the 'data' axis only; on a 2-D data x model
        # mesh (tensor-parallel expansion) each model group of n_model
        # chips cooperates on one data shard, so the global batch scales
        # with the data-axis size, not the chip count.
        self.n_data = dict(self.mesh.shape).get("data", self.n_devices)
        self.global_batch = per_device_batch * self.n_data
        self.sd = sd_dataset
        self.output_dir = output_dir
        self.seed = seed
        self.base_key = jax.random.PRNGKey(seed)

        shard = data_sharding(self.mesh)
        repl = replicated(self.mesh)
        psh = param_shardings if param_shardings is not None else repl
        if prejitted:
            # e.g. a SplitExpand built with this mesh — already compiled
            # with the right shardings.
            self._expand = expand_fn
        else:
            self._expand = jax.jit(
                expand_fn,
                in_shardings=(psh, shard, shard, shard, shard, shard),
                out_shardings=shard,
            )
        self._params = jax.device_put(params, psh)
        self._writers = ThreadPoolExecutor(max_workers=writer_threads)

    # ------------------------------------------------------------------
    def _unit_key(self, unit: WorkUnit) -> jax.Array:
        k = jax.random.fold_in(self.base_key, unit.dataset_index)
        return jax.random.fold_in(k, unit.image_i)

    def _batch_arrays(self, units: Sequence[WorkUnit]):
        from distdiff_tpu.sampling.conditioning import cond_stack

        items = [self.sd[u.dataset_index] for u in units]
        latents = np.stack([it.latent for it in items])
        cond = cond_stack([it.cond for it in items])
        uncond = cond_stack([it.uncond for it in items])
        targets = np.asarray([it.target for it in items], np.int32)
        keys = jnp.stack([self._unit_key(u) for u in units])
        return latents, cond, uncond, targets, keys

    def run(
        self,
        num_images_per_prompt: int,
        first_image_index: int = 0,
        split: int = 0,
        total_split: int = 1,
        skip_existing: bool = True,
        max_units: Optional[int] = None,
        progress: Optional[Callable[[int, int], None]] = None,
    ) -> dict:
        class_per_item = [self.sd.class_names[l] for l in self.sd.labels]
        units = build_manifest(
            self.sd.image_paths, class_per_item, self.output_dir,
            num_images_per_prompt, first_image_index, split, total_split,
            skip_existing,
        )
        if max_units is not None:
            units = units[:max_units]
        chunks = chunk_units(units, self.global_batch)
        log.info(
            "expansion manifest: %d pending units in %d batches of %d "
            "(%d data shards x %d/shard, %d devices)",
            len(units), len(chunks), self.global_batch, self.n_data,
            self.global_batch // self.n_data, self.n_devices,
        )

        t0 = time.time()
        written = 0
        pending = []
        # (timestamp, cumulative written) after each drained batch — the
        # first entry absorbs compile/first-dispatch, so the slope over the
        # rest is the steady-state production rate incl. host prep + PNG
        # submission (what the <30min/15k-img north star is about)
        drain_marks: List = []
        # Keep one batch in flight: JAX dispatch is async, so the host
        # fetches/encodes batch i while the device runs batch i+1 (the
        # np.asarray sync otherwise serializes device and host work).
        from collections import deque

        inflight = deque()

        def drain():
            nonlocal written
            chunk_, mask_, dev_images = inflight.popleft()
            host = np.asarray(dev_images)  # sync THIS batch only
            for u, m, img in zip(chunk_, mask_, host):
                if not m:
                    continue
                pending.append(self._writers.submit(save_png, u.out_path, img))
                written += 1
            drain_marks.append((time.time(), written))

        for bi, (chunk, mask) in enumerate(chunks):
            latents, cond, uncond, targets, keys = self._batch_arrays(chunk)
            images = self._expand(
                self._params, latents, cond, uncond, targets, keys
            )
            inflight.append((chunk, mask, images))
            if len(inflight) >= 2:
                drain()
            if progress is not None:
                progress(bi + 1, len(chunks))
        while inflight:
            drain()
        for f in pending:
            f.result()
        dt = time.time() - t0
        stats = {
            "units": len(units),
            "written": written,
            "seconds": dt,
            "images_per_sec": written / dt if dt > 0 else 0.0,
            "images_per_sec_per_device": (
                written / dt / self.n_devices if dt > 0 else 0.0
            ),
        }
        if len(drain_marks) >= 2:
            (t_a, w_a), (t_b, w_b) = drain_marks[0], drain_marks[-1]
            if t_b > t_a and w_b > w_a:
                stats["images_per_sec_steady"] = (w_b - w_a) / (t_b - t_a)
                stats["images_per_sec_steady_per_device"] = (
                    stats["images_per_sec_steady"] / self.n_devices
                )
        log.info("expansion done: %s", stats)
        return stats
