"""Dataset primitives: path-list datasets, expanded-tree reader, loaders.

Replaces the reference's torchvision-backed dataset classes:
  * ``ImageListDataset`` ~ ``ImageDatasetFromPaths`` (``dataloader.py:67-86``)
    — PIL open + EXIF transpose + RGB convert + transform.
  * ``DatasetByClassNames`` — reads the ``{root}/{classname}/*.png`` tree the
    generator writes (the on-disk contract,
    ``train_expanded_data_concat_original.py:91-117``), with the
    ``expand_num`` index filter from ``train_transform.py:158-169``.
  * ``ArrayDataset`` — in-memory arrays (medmnist npz splits).
  * ``BatchLoader`` — shuffling, multi-threaded prefetching batcher feeding
    numpy arrays to JAX (the torch DataLoader role).
"""

from __future__ import annotations

import os
import re
import threading
import queue as queue_mod
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageOps


# Global data-augmentation seed (set from --manualSeed via cli.common.
# set_seed). Per-item RNG is derived as (seed, epoch, index) so the same
# seed reproduces the same augmentation stream — the reference gets this
# from global torch/np seeding (train.py:98-111).
_DATA_SEED = [0]


def set_data_seed(seed: int) -> None:
    _DATA_SEED[0] = int(seed)


def _item_rng(seed: Optional[int], epoch: int, idx: int) -> np.random.Generator:
    s = _DATA_SEED[0] if seed is None else seed
    return np.random.default_rng((s, epoch, idx))


def load_image(path: str) -> Image.Image:
    img = Image.open(path)
    img = ImageOps.exif_transpose(img)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return img


class ImageListDataset:
    """Images given by explicit (path, label) lists."""

    def __init__(
        self,
        image_paths: Sequence[str],
        labels: Sequence[int],
        transform: Optional[Callable] = None,
        seed: Optional[int] = None,
    ):
        assert len(image_paths) == len(labels)
        self.image_paths = list(image_paths)
        self.labels = list(labels)
        self.transform = transform
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, idx: int):
        img = load_image(self.image_paths[idx])
        rng = _item_rng(self.seed, self.epoch, idx)
        if self.transform is not None:
            img = self.transform(img, rng)
        return img, self.labels[idx]


class ArrayDataset:
    """In-memory (N, H, W, C) uint8 images + labels (medmnist splits)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 transform: Optional[Callable] = None,
                 seed: Optional[int] = None):
        self.images = images
        self.labels = np.asarray(labels).reshape(-1)
        self.transform = transform
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx: int):
        arr = self.images[idx]
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        img = Image.fromarray(arr)
        rng = _item_rng(self.seed, self.epoch, idx)
        if self.transform is not None:
            img = self.transform(img, rng)
        return img, int(self.labels[idx])


_EXPAND_RE = re.compile(r"_expand_(\d+)\.(png|jpg|jpeg)$", re.IGNORECASE)
_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


class DatasetByClassNames(ImageListDataset):
    """Reader for the generated-expansion tree ``{root}/{classname}/*.png``.

    ``expand_num`` keeps only images whose ``_expand_{i}`` index is < N
    (``train_transform.py:158-169``); None keeps everything
    (``train_expanded_data_concat_original.py:91-117``).
    """

    def __init__(
        self,
        root: str,
        class_names: Sequence[str],
        transform: Optional[Callable] = None,
        expand_num: Optional[int] = None,
    ):
        paths: List[str] = []
        labels: List[int] = []
        for ci, name in enumerate(class_names):
            cdir = os.path.join(root, name)
            if not os.path.isdir(cdir):
                continue
            for fname in sorted(os.listdir(cdir)):
                if not fname.lower().endswith(_IMG_EXTS):
                    continue
                if expand_num is not None:
                    m = _EXPAND_RE.search(fname)
                    if m is not None and int(m.group(1)) >= expand_num:
                        continue
                paths.append(os.path.join(cdir, fname))
                labels.append(ci)
        super().__init__(paths, labels, transform)


class ConcatDataset:
    """original ⊕ expanded (``train_expanded_data_concat_original.py:153-156``)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def set_epoch(self, epoch: int) -> None:
        for d in self.datasets:
            if hasattr(d, "set_epoch"):
                d.set_epoch(epoch)

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, idx: int):
        di = int(np.searchsorted(self._offsets, idx, side="right")) - 1
        return self.datasets[di][idx - int(self._offsets[di])]


class RepeatDataset:
    """N× replication (the no-expansion control arm,
    ``train_transform.py:245``)."""

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.dataset) * self.times

    def __getitem__(self, idx: int):
        return self.dataset[idx % len(self.dataset)]


class SubsetDataset:
    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, idx: int):
        return self.dataset[self.indices[idx]]


class BatchLoader:
    """Threaded prefetching batch iterator -> (images [B,...], labels [B]).

    With ``drop_last=False`` the final short batch is PADDED to the full
    batch size (XLA static shapes) and a boolean ``mask`` marks real rows;
    iteration yields (images, labels, mask).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        num_threads: int = 4,
        collate: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.collate = collate
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self):
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self.epoch)
        idx = self._indices()
        bs = self.batch_size
        n_batches = len(self)
        ex = ThreadPoolExecutor(max_workers=self.num_threads)
        try:
            def fetch(batch_ids):
                items = list(ex.map(self.dataset.__getitem__, batch_ids))
                if self.collate is not None:
                    return self.collate(items, bs)
                imgs = np.stack([np.asarray(it[0], np.float32) for it in items])
                labels = np.asarray([it[1] for it in items], np.int32)
                mask = np.ones(len(items), bool)
                if len(items) < bs:  # pad the ragged tail
                    pad = bs - len(items)
                    imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
                    labels = np.concatenate([labels, np.repeat(labels[-1:], pad)])
                    mask = np.concatenate([mask, np.zeros(pad, bool)])
                return imgs, labels, mask

            # double-buffer: submit next while the caller consumes current
            futures = []
            for bi in range(n_batches):
                batch_ids = idx[bi * bs : (bi + 1) * bs]
                futures.append(ex.submit(fetch, batch_ids))
                if len(futures) > 2:
                    yield futures.pop(0).result()
            for f in futures:
                yield f.result()
        finally:
            ex.shutdown(wait=False)
        self.epoch += 1
