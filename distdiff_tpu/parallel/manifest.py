"""Work manifest for expansion — the resume/sharding bookkeeping.

The reference resumes by checking output-PNG existence per (image, image_i)
inside the hot loop (``generate_data.py:1131-1143``) and shards work by
slicing the dataset into ``total_split`` contiguous index ranges
(``:1001-1009``). Here the same information becomes an explicit host-side
manifest built once up front: pending units = all (dataset_index, image_i)
pairs whose output file does not exist, optionally restricted to a
``--split`` range for CLI parity. The driver consumes the manifest in
device-batch-sized chunks (padded + masked for static shapes).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple


def output_path(output_dir: str, class_name: str, image_path: str, image_i: int) -> str:
    """``{out}/{class}/{stem}_expand_{i}.png`` (``generate_data.py:1232``)."""
    stem = os.path.basename(image_path).split(".")[0]
    return os.path.join(output_dir, class_name, f"{stem}_expand_{image_i}.png")


@dataclasses.dataclass(frozen=True)
class WorkUnit:
    dataset_index: int
    image_i: int
    out_path: str


def split_range(n: int, split: int, total_split: int) -> Tuple[int, int]:
    """The reference's contiguous split (``generate_data.py:1001-1009``)."""
    per = n // total_split
    start = split * per
    end = n if split == total_split - 1 else (split + 1) * per
    return start, end


def build_manifest(
    image_paths: Sequence[str],
    class_names: Sequence[str],          # per-item class name
    output_dir: str,
    num_images_per_prompt: int,
    first_image_index: int = 0,
    split: int = 0,
    total_split: int = 1,
    skip_existing: bool = True,
) -> List[WorkUnit]:
    lo, hi = split_range(len(image_paths), split, total_split)
    units: List[WorkUnit] = []
    for di in range(lo, hi):
        for image_i in range(first_image_index, num_images_per_prompt):
            out = output_path(output_dir, class_names[di], image_paths[di], image_i)
            if skip_existing and os.path.exists(out):
                continue
            units.append(WorkUnit(di, image_i, out))
    return units


def chunk_units(
    units: Sequence[WorkUnit], global_batch: int
) -> List[Tuple[List[WorkUnit], List[bool]]]:
    """Chunk into fixed-size batches; the tail is padded by repeating its
    last unit with mask=False (static shapes for the compiled program)."""
    out = []
    for i in range(0, len(units), global_batch):
        chunk = list(units[i : i + global_batch])
        mask = [True] * len(chunk)
        while len(chunk) < global_batch:
            chunk.append(chunk[-1])
            mask.append(False)
        out.append((chunk, mask))
    return out
