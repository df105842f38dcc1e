"""Generator distribution probe: color-bias / diversity sweep over
(strength, guidance_scale) for an expansion config.

Dataset expansion only helps downstream accuracy when the generator
samples stay ON the class-conditional data distribution (the reference
relies on a fully-trained SD checkpoint for this; see
``/root/reference/generate_data.py:687-732`` — its guidance optimizes
*within* the model's manifold). This probe quantifies the two failure
modes that silently break the quality loop:

  * **color-bias**: mean |E[gen] - E[data]| per class over RGB channel
    means — a systematic pull toward the global mean indicates the
    denoiser is under-trained for the conditioning / CFG scale.
  * **diversity**: mean per-class std of image channel means vs the data's
    own — collapse indicates the CFG scale is too high for the model.

Used to calibrate scripts/quality_loop.py's tiny pipeline (round 4: the
sweep picked strength 0.3 / cfg 1.0, bias 2.5 vs 40+ at the old
strength 0.5 / cfg 7.5 config — see docs/quality_loop_v5e_r4.md).

Example:
  python scripts/generator_probe.py --data_root /tmp/ql/data \\
      --dataset breastmnist --params_path /tmp/ql/sd_params_unet \\
      --configs 0.3:1.0 0.3:3.0 0.5:7.5 --out /tmp/gsweep
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def class_stats(root: str) -> dict:
    """Per-class [N,3] channel means of every PNG under root/<class>/."""
    from PIL import Image

    out = {}
    for cd in sorted(glob.glob(os.path.join(root, "*"))):
        if not os.path.isdir(cd):
            continue
        ms = [
            np.asarray(Image.open(f).convert("RGB"), np.float32)
            .reshape(-1, 3).mean(0)
            for f in sorted(glob.glob(os.path.join(cd, "*.png")))
        ]
        if ms:
            out[os.path.basename(cd)] = np.stack(ms)
    return out


def probe(train_root: str, gen_root: str) -> dict:
    """Color-bias and diversity of one generated tree vs the train tree."""
    train = class_stats(train_root)
    gen = class_stats(gen_root)
    # generated dirs may normalise spaces; match on normalised names
    norm = {c.replace(" ", "_"): c for c in train}
    bias, div = [], []
    for c, m in gen.items():
        t = train.get(c)
        if t is None:  # ndarray truthiness is ambiguous — no `or` chains
            t = train.get(norm.get(c.replace(" ", "_"), c))
        if t is None:
            continue
        bias.append(np.abs(m.mean(0) - t.mean(0)).mean())
        div.append(m.std(0).mean())
    data_div = float(np.mean([m.std(0).mean() for m in train.values()]))
    return {
        "color_bias": float(np.mean(bias)),
        "diversity": float(np.mean(div)),
        "data_diversity": data_div,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dataset", default="breastmnist")
    p.add_argument("--data_root", required=True)
    p.add_argument("--params_path", default=None)
    p.add_argument("--sd_checkpoint", default=None)
    p.add_argument("--configs", nargs="+", default=["0.3:1.0", "0.3:3.0",
                                                    "0.5:7.5"],
                   help="strength:guidance_scale pairs")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--num_images_per_prompt", type=int, default=4)
    p.add_argument("--resolution", type=int, default=32)
    p.add_argument("--tiny", action="store_true", default=True)
    p.add_argument("--no-tiny", dest="tiny", action="store_false")
    p.add_argument("--out", default="/tmp/generator_probe")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    train_root = os.path.join(args.data_root, "medmnist", args.dataset,
                              "train")
    if not os.path.isdir(train_root):  # registry datasets use other layouts
        train_root = os.path.join(args.data_root, args.dataset, "train")
    rows = {}
    for cfgs in args.configs:
        strength, cfg = (float(x) for x in cfgs.split(":"))
        out = os.path.join(args.out, f"s{strength}_c{cfg}")
        # a dir without the marker is a crashed partial run: regenerate
        # (generate_data's manifest skips PNGs that already exist)
        done_marker = os.path.join(out, ".complete")
        if not os.path.exists(done_marker):
            cmd = [sys.executable, "-m", "distdiff_tpu.cli.generate_data",
                   "-d", args.dataset, "--data_root", args.data_root,
                   "--guidance_type", "none",
                   "--num_images_per_prompt",
                   str(args.num_images_per_prompt),
                   "--train_batch_size", "1",
                   "--strength", str(strength),
                   "--guidance_scale", str(cfg),
                   "--steps", str(args.steps),
                   "--resolution", str(args.resolution),
                   "--seed", "0", "--output_dir", out]
            if args.tiny:
                cmd += ["--tiny"]
            if args.params_path:
                cmd += ["--params_path", args.params_path]
            if args.sd_checkpoint:
                cmd += ["--sd_checkpoint", args.sd_checkpoint]
            r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
            if r.returncode:
                print(f"FAIL s={strength} c={cfg}: {r.stderr[-300:]}",
                      flush=True)
                continue
            with open(done_marker, "w") as f:
                f.write("ok\n")
        row = probe(train_root, out)
        rows[cfgs] = row
        print(f"strength={strength} cfg={cfg}: "
              f"color-bias {row['color_bias']:6.1f}  "
              f"diversity {row['diversity']:5.1f} "
              f"(data {row['data_diversity']:.1f})", flush=True)
    with open(os.path.join(args.out, "probe.json"), "w") as f:
        json.dump(rows, f, indent=2)
    return rows


if __name__ == "__main__":
    main()
