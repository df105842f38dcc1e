"""Generation-side dataset: images + cached VAE latents + text embeddings.

Re-designs the reference's ``SDDataset`` (``dataloader.py:750-852``):
  * per-class text embeddings precomputed once from ``CUSTOM_TEMPLATES`` (or
    a per-class sentence bank pickle when ``language_enhance`` is on,
    ``dataloader.py:769-786``), plus the uncond ("") embedding;
  * VAE latents of every train image precomputed in *batches* on device
    (the reference encodes one image at a time, ``dataloader.py:798-810``)
    and disk-cached at ``save/vae_embedding/{dataset}/{model}/
    image_latents.npy`` — same path convention, numpy instead of torch.save;
  * items carry (latent, cond-embed, uncond-embed, classname, path, target)
    — the generation driver batches them into device arrays.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Callable, List, Optional, Sequence

import numpy as np

from distdiff_tpu.data.datasets import load_image
from distdiff_tpu.data.registry import LoadedDataset, load_dataset
from distdiff_tpu.data.templates import template_for
from distdiff_tpu.data.transforms import sd_transform

VAE_EMBED_DIR = "save/vae_embedding"


@dataclasses.dataclass
class SDItem:
    latent: np.ndarray        # [h, w, 4] scaled VAE latent
    # conditioning pytree: [T, D] text embedding for SD-1.x, or the SDXL
    # {"ctx": [T, 2048], "add": [2816]} dict (sampling.conditioning)
    cond: object
    uncond: object
    class_name: str
    image_path: str
    target: int


class SDDataset:
    def __init__(
        self,
        dataset: str,
        encode_text_fn: Callable[[Sequence[str]], np.ndarray],
        encode_images_fn: Callable[[np.ndarray], np.ndarray],
        model_name: str = "CompVis/stable-diffusion-v1-4",
        size: int = 512,
        center_crop: bool = False,
        language_enhance: bool = False,
        data_root: Optional[str] = None,
        cache_root: str = ".",
        encode_batch: int = 8,
        loaded: Optional[LoadedDataset] = None,
        seed: int = 0,
    ):
        self.dataset_name = dataset
        self.size = size
        self.center_crop = center_crop
        self.rng = np.random.default_rng(seed)
        self.loaded = loaded if loaded is not None else load_dataset(
            dataset, data_root=data_root
        )
        self.class_names = self.loaded.classnames
        train = self.loaded.train
        self.image_paths = list(train.image_paths)
        self.labels = list(train.labels)
        self.transform = sd_transform(size, center_crop)

        # encode_text_fn returns the conditioning pytree for a list of
        # prompts: [N, T, D] for SD-1.x, {"ctx": [N,T,D], "add": [N,A]} for
        # SDXL — handled leaf-wise throughout (sampling.conditioning).
        from distdiff_tpu.sampling.conditioning import (
            cond_asarray,
            cond_index,
        )

        self.language_enhance = language_enhance
        if language_enhance:
            # per-class sentence bank: data/{dataset}_le.pkl
            # (dataloader.py:770-778); one embedding per sentence.
            le_path = os.path.join(data_root or "./data", f"{dataset}_le.pkl")
            with open(le_path, "rb") as f:
                bank = pickle.load(f)
            bank = {k.replace("_", " "): v for k, v in bank.items()}
            self.class_embeds = [
                cond_asarray(encode_text_fn(list(bank[c])))
                for c in self.class_names
            ]  # list of per-class [S, ...] leaf stacks
        else:
            template = template_for(dataset)
            prompts = [template.format(c) for c in self.class_names]
            self.class_embeds = cond_asarray(encode_text_fn(prompts))
        self.uncond_embed = cond_index(
            cond_asarray(encode_text_fn([""])), 0)

        self.latents = self._load_or_encode_latents(
            encode_images_fn, model_name, cache_root, encode_batch
        )

    # ------------------------------------------------------------------
    def _cache_path(self, model_name: str, cache_root: str) -> str:
        # Unlike the reference (512 hardcoded, dataloader.py:804), size and
        # center_crop are live here — key the cache on them so re-running at
        # another resolution can't silently reuse stale latents. The
        # unsuffixed reference-convention name is kept for the default
        # 512/no-crop geometry.
        suffix = (
            "" if (self.size == 512 and not self.center_crop)
            else f"_{self.size}" + ("_cc" if self.center_crop else "")
        )
        return os.path.join(
            cache_root, VAE_EMBED_DIR, self.dataset_name,
            model_name.replace("/", "--"), f"image_latents{suffix}.npy",
        )

    def _load_or_encode_latents(
        self, encode_images_fn, model_name, cache_root, encode_batch
    ) -> np.ndarray:
        path = self._cache_path(model_name, cache_root)
        if os.path.exists(path):
            latents = np.load(path)
            if len(latents) == len(self.image_paths):
                return latents
        os.makedirs(os.path.dirname(path), exist_ok=True)
        out = []
        n = len(self.image_paths)
        for i in range(0, n, encode_batch):
            chunk = self.image_paths[i : i + encode_batch]
            imgs = np.stack([
                self.transform(load_image(p), self.rng) for p in chunk
            ])  # [b, H, W, 3] in [-1, 1]
            pad = encode_batch - len(chunk)
            if pad:  # static shapes for the jitted encoder
                imgs = np.concatenate([imgs, np.repeat(imgs[-1:], pad, 0)])
            lat = np.asarray(encode_images_fn(imgs))
            out.append(lat[: len(chunk)])
        latents = np.concatenate(out, 0).astype(np.float32)
        np.save(path, latents)
        return latents

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, idx: int) -> SDItem:
        from distdiff_tpu.sampling.conditioning import (
            cond_index,
            cond_leading_dim,
        )

        target = self.labels[idx]
        if self.language_enhance:
            sents = self.class_embeds[target]
            cond = cond_index(
                sents, int(self.rng.integers(0, cond_leading_dim(sents))))
        else:
            cond = cond_index(self.class_embeds, target)
        return SDItem(
            latent=self.latents[idx],
            cond=cond,
            uncond=self.uncond_embed,
            class_name=self.class_names[target],
            image_path=self.image_paths[idx],
            target=int(target),
        )


def collate_sd(items: List[SDItem]):
    """Stack SDItems into device-ready arrays (reference ``collate_fn``,
    ``generate_data.py:642-684``). Conditioning stacks leaf-wise (SD-1.x
    arrays and SDXL {"ctx","add"} dicts alike)."""
    from distdiff_tpu.sampling.conditioning import cond_stack

    return {
        "latents": np.stack([it.latent for it in items]),
        "cond": cond_stack([it.cond for it in items]),
        "uncond": cond_stack([it.uncond for it in items]),
        "targets": np.asarray([it.target for it in items], np.int32),
        "class_names": [it.class_name for it in items],
        "image_paths": [it.image_path for it in items],
    }
