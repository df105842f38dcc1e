"""GroupNorm(+silu) implementation shoot-out at the pipeline's hot shapes.

Per (shape, batch): XLA layout-aware GN+act vs single-pass Pallas vs the
chunked two-pass Pallas — slope-harness timed (full outputs consumed).
Decides the ops/groupnorm.py dispatch defaults; findings land in CLAUDE.md.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.kernel_bench import device_time
from distdiff_tpu.ops.groupnorm import (
    _fits_vmem,
    _pallas_group_norm,
    _pallas_group_norm_chunked,
    xla_group_norm,
)

SHAPES = [
    # (b, h, w, c) — UNet hot stages at the CFG-16 bench batch
    (16, 64, 64, 320),
    (16, 32, 32, 640),
    (16, 16, 16, 1280),
    # VAE decoder stages (batch 1 and the guidance-rollout batch 8)
    (1, 128, 128, 512),
    (1, 256, 256, 256),
    (1, 512, 512, 128),
    (8, 512, 512, 128),
]


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    for b, h, w, c in SHAPES:
        x = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
        scale = jnp.asarray(rng.randn(c), jnp.float32)
        bias = jnp.asarray(rng.randn(c), jnp.float32)
        it = max(4, iters // 2) if h >= 256 else iters
        rows = []
        for name, fn in [
            ("xla", lambda xx: xla_group_norm(xx, scale, bias, 32, 1e-5, "silu")),
            ("pallas1" if _fits_vmem(x) else "pallas1(skip:>vmem)",
             lambda xx: _pallas_group_norm(xx, scale, bias, 32, 1e-5, "silu")),
            ("chunked",
             lambda xx: _pallas_group_norm_chunked(xx, scale, bias, 32, 1e-5,
                                                   "silu")),
        ]:
            if name.endswith("(skip:>vmem)"):
                rows.append(f"{name.split('(')[0]}    skip")
                continue
            t = device_time(fn, [x], it)
            gbs = 2 * x.size * x.dtype.itemsize / t / 1e9
            rows.append(f"{name} {t * 1e6:9.1f} us ({gbs:6.0f} GB/s)")
        print(f"[{b:>2d},{h:>3d},{w:>3d},{c:>4d}]  " + " | ".join(rows),
              flush=True)


if __name__ == "__main__":
    main()
