"""Prove the --sd_checkpoint path end-to-end at REAL SD-1.5 geometry.

No genuine SD checkpoint is reachable in this air-gapped image, so this
synthesizes one that is byte-layout identical to a diffusers save (exact
key set / shapes / file layout / tokenizer files — ``weights/synth.py``)
and drives the REAL CLI against it on the attached TPU:

  convert (strict 0/0/0 validation) -> BPE auto-discovery (real CLIPTokenizer,
  not the hash fallback) -> SDDataset caching -> prototypes -> sharded driver
  -> PNG contract.

With a genuine checkpoint only the tensor values change. Reference:
``generate_data.py:863-922`` (load), ``:1130-1245`` (loop).

  python scripts/real_weights_e2e.py [--ckpt /tmp/synth_sd15] [--keep]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def make_toy_dataset(root: str, classes=("alpha", "beta"), n=2):
    rng = np.random.RandomState(0)
    for ci, cat in enumerate(classes):
        base = os.path.join(root, "medmnist", "breastmnist")
        for split, k in (("train", n), ("test", 1)):
            for i in range(k):
                p = os.path.join(base, split, cat, f"img_{i}.png")
                os.makedirs(os.path.dirname(p), exist_ok=True)
                shade = 50 + 150 * ci
                arr = rng.randint(0, 60, (96, 96, 3)).astype(np.uint8)
                arr[..., 0] = np.minimum(255, arr[..., 0] + shade)
                Image.fromarray(arr).save(p)
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="/tmp/synth_sd15")
    p.add_argument("--workdir", default=None)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--max_units", type=int, default=2)
    p.add_argument("--n_per_class", type=int, default=2,
                   help="fabricated train images per class")
    p.add_argument("--num_images_per_prompt", type=int, default=1)
    args = p.parse_args()

    from distdiff_tpu.config import PipelineConfig
    from distdiff_tpu.weights.synth import write_synth_checkpoint

    cfg = PipelineConfig.sd15()
    if not os.path.exists(os.path.join(args.ckpt, "unet")):
        t0 = time.time()
        write_synth_checkpoint(args.ckpt, cfg, seed=0)
        print(f"synthesized real-geometry checkpoint at {args.ckpt} "
              f"({time.time()-t0:.0f}s)", flush=True)

    workdir = args.workdir or tempfile.mkdtemp(prefix="distdiff_e2e_")
    data_root = make_toy_dataset(os.path.join(workdir, "data"),
                                 n=args.n_per_class)
    os.chdir(workdir)  # save/ caches land here
    out_dir = os.path.join(workdir, "out")

    from distdiff_tpu.cli import generate_data as cli_gen

    t0 = time.time()
    stats = cli_gen.main([
        "-d", "breastmnist", "--data_root", data_root,
        "--sd_checkpoint", args.ckpt,
        "-a", "resnet50",
        "--guidance_type", "transform_guidance",
        # pin the published recipe explicitly (the CLI defaults now match
        # the reference's, i.e. guidance_step 1 / period 1 / strength 0.9)
        "--guidance_step", "20", "--guidance_period", "2",
        "--strength", "0.5", "--constraint_value", "0.2",
        "--optimize_targets", "global_prototype-local_prototype",
        "--num_images_per_prompt", str(args.num_images_per_prompt),
        "--train_batch_size", str(args.batch),
        "--max_units", str(args.max_units),
        "--output_dir", out_dir, "--seed", "0",
    ])
    dt = time.time() - t0
    print(f"driver stats: {stats}", flush=True)
    pngs = []
    for r, _, files in os.walk(out_dir):
        pngs += [os.path.join(r, f) for f in files if f.endswith(".png")]
    assert stats["written"] > 0 and pngs, (stats, pngs)
    img = np.asarray(Image.open(pngs[0]))
    assert img.shape == (512, 512, 3), img.shape
    print(f"REAL-GEOMETRY E2E OK: {stats['written']} pngs in {dt:.0f}s, "
          f"first={pngs[0]} shape={img.shape}", flush=True)


if __name__ == "__main__":
    main()
