"""Aggregate multi-seed results — the reference's ``parse_logs.py``: read
``results.yaml`` ``best_accuracy`` across seed dirs, print mean ± std
(``parse_logs.py:21-66``); also supports the legacy log.txt regex
(``The best performance:<float>``, ``parse_logs.py:12-19``).

Usage:
  python -m distdiff_tpu.cli.parse_logs checkpoint/caltech-101/resnet50_lr0.1 --multi
"""

from __future__ import annotations

import argparse
import os
import re
from typing import List, Optional

import numpy as np
import yaml

_LEGACY_RE = re.compile(r"The best performance:(\d+\.?\d*)")


def extract_performance(log_path: str) -> Optional[float]:
    try:
        with open(log_path) as f:
            matches = _LEGACY_RE.findall(f.read())
        return float(matches[-1]) if matches else None
    except OSError:
        return None


def collect(exp_dir: str, multi: bool) -> List[float]:
    perfs: List[float] = []
    if not os.path.isdir(exp_dir):
        return perfs
    dirs = (
        [os.path.join(exp_dir, d) for d in sorted(os.listdir(exp_dir))
         if os.path.isdir(os.path.join(exp_dir, d))]
        if multi else [exp_dir]
    )
    for d in dirs:
        ry = os.path.join(d, "results.yaml")
        if os.path.exists(ry):
            with open(ry) as f:
                data = yaml.safe_load(f)
            if data and "best_accuracy" in data:
                perfs.append(float(data["best_accuracy"]))
                continue
        legacy = extract_performance(os.path.join(d, "log.txt"))
        if legacy is not None:
            perfs.append(legacy)
    return perfs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("exp", type=str)
    p.add_argument("--multi", action="store_true",
                   help="aggregate over seed subdirectories")
    args = p.parse_args(argv)

    perfs = collect(args.exp, args.multi)
    if perfs:
        print(
            f"Average  of {len(perfs)} files is "
            f"{np.mean(perfs):.2f} +- {np.std(perfs):.2f}"
        )
    else:
        print("No valid performances found in the specified directory.")
    return perfs


if __name__ == "__main__":
    main()
