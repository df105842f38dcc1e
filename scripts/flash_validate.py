"""One-command hardware numerics validation of the Pallas flash kernels.

Runs forward AND backward against the XLA reference on the attached backend
across every block regime the dispatcher can take (VERDICT r2 #6):

  * single-block softmax kernel (kv fits one block; cross-attention and the
    64^2 self-attention after the bk=4096 retune)
  * multi-block online-softmax kernel (forced small bk, and the SDXL 16k
    sequence naturally)
  * padded q and kv tails (non-multiple lengths)
  * the big-D block shrink (VAE single-head D=512)
  * the softmax variants: ones-column l (default), constant-shift no-max,
    bf16-p — each checked against default

Usage: python scripts/flash_validate.py            (on the real chip)
       JAX_PLATFORMS=cpu DISTDIFF_PALLAS_INTERPRET=1 python scripts/flash_validate.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/distdiff_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILED = []


def _check(tag, a, b, atol, rtol):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    err = np.max(np.abs(a - b) / (atol + rtol * np.abs(b)))
    ok = bool(err <= 1.0) and np.isfinite(a).all()
    print(f"  {tag:<14s} relerr {err:8.3f}  {'OK' if ok else 'FAIL'}",
          flush=True)
    if not ok:
        FAILED.append(tag)


# module-level softmax-variant switches (read at import in flash.py):
# env var name -> flash module attribute
_FLAGS = {"DISTDIFF_FLASH_MATL": "_MAT_L", "DISTDIFF_FLASH_NOMAX": "_NO_MAX",
          "DISTDIFF_FLASH_BF16P": "_BF16_P"}


def run_case(name, b, tq, tk, h, d, dtype, env=None, atol=None, rtol=None):
    from distdiff_tpu.ops.attention import xla_attention
    from distdiff_tpu.ops import flash

    env = dict(env or {})
    flags = {_FLAGS[k]: env.pop(k) == "1" for k in list(env) if k in _FLAGS}
    old = {k: os.environ.get(k) for k in env}
    old_flags = {a: getattr(flash, a) for a in flags}
    os.environ.update(env)
    for a, vv in flags.items():
        setattr(flash, a, vv)
    try:
        if atol is None:
            if dtype == jnp.bfloat16:
                atol = 2e-2
            elif jax.default_backend() == "tpu":
                # fp32 inputs still ride bf16 MXU passes at default matmul
                # precision on TPU — both the kernel's dots and any fp32
                # "reference" are bf16-pass-limited, so fp32 comparisons
                # can only be as tight as bf16 rounding allows.
                atol = 5e-3
            else:
                atol = 2e-4
        rtol = rtol if rtol is not None else atol
        rng = np.random.RandomState(hash(name) % 2**31)
        q = jnp.asarray(rng.randn(b, tq, h, d), dtype)
        k = jnp.asarray(rng.randn(b, tk, h, d), dtype)
        v = jnp.asarray(rng.randn(b, tk, h, d), dtype)
        w = jnp.asarray(rng.randn(b, tq, h, d), dtype)
        print(f"{name}: b{b} tq{tq} tk{tk} h{h} d{d} {jnp.dtype(dtype).name} "
              f"{env}", flush=True)

        fwd = jax.jit(flash.flash_attention)
        ref_f = jax.jit(xla_attention)
        _check("forward", fwd(q, k, v), ref_f(q, k, v), atol, rtol)

        loss = lambda att: (lambda *a: jnp.sum(att(*a).astype(jnp.float32) * w.astype(jnp.float32)))
        g = jax.jit(jax.grad(loss(flash.flash_attention), argnums=(0, 1, 2)))(q, k, v)
        gr = jax.jit(jax.grad(loss(xla_attention), argnums=(0, 1, 2)))(q, k, v)
        for tag, a_, b_ in zip(("dq", "dk", "dv"), g, gr):
            _check(tag, a_, b_, atol * 4, rtol * 8)
    finally:
        for kk, vv in old.items():
            if vv is None:
                os.environ.pop(kk, None)
            else:
                os.environ[kk] = vv
        for a, vv in old_flags.items():
            setattr(flash, a, vv)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    f32, bf16 = jnp.float32, jnp.bfloat16

    # single-block kernel: exact-multiple (mask elided) and padded kv
    run_case("single/exact", 2, 512, 512, 4, 40, f32)
    run_case("single/padded", 1, 300, 130, 2, 40, f32)
    run_case("cross/77kv", 2, 1024, 77, 8, 40, bf16)

    # multi-block online kernel (forced small blocks; exact + padded)
    mb = {"DISTDIFF_FLASH_BQ": "256", "DISTDIFF_FLASH_BK": "256"}
    run_case("online/exact", 1, 512, 1024, 2, 40, f32, env=mb)
    run_case("online/padded", 1, 512, 900, 2, 40, f32, env=mb)

    # big-D shrink path (VAE head) and the SD hot shape in bf16
    run_case("bigD/512", 1, 512, 512, 1, 512, f32)
    run_case("sd/self4096", 2, 4096, 4096, 8, 40, bf16)

    # softmax variants vs their own XLA reference
    run_case("variant/no-matl", 2, 512, 512, 4, 40, f32,
             env={"DISTDIFF_FLASH_MATL": "0"})
    run_case("variant/nomax", 2, 512, 512, 4, 40, f32,
             env={"DISTDIFF_FLASH_NOMAX": "1"})
    run_case("variant/bf16p", 2, 512, 512, 4, 40, bf16,
             env={"DISTDIFF_FLASH_BF16P": "1"}, atol=5e-2)

    if FAILED:
        print(f"\nFAILED: {FAILED}", flush=True)
        sys.exit(1)
    print("\nall flash numerics checks passed", flush=True)


if __name__ == "__main__":
    main()
