"""Fused Pallas GroupNorm(+affine) — the UNet's hottest non-matmul op.

Measured on v5e (full-output-liveness slope harness, scripts/kernel_bench):
a 3x3 conv at the SD hot shape (64^2 x 320, b2) runs ~160us (~48% MXU) and a
ResnetBlock ~330us = two convs + this fused GN/silu — the unfused XLA
GroupNorm paid multiple HBM passes (reduce, reduce, normalize). This kernel
does ONE pass per batch row: the [HW, C] slab is staged in VMEM, per-group
statistics come from two tiny 0/1-matrix matmuls (lane-segmented reductions
are awkward on the VPU; the MXU does them for free), and the affine is
folded into the final elementwise.

Forward-only kernel: the backward (needed on the guidance path) falls back
to the differentiable XLA formula via custom_vjp — spans are fwd-only and
get the full win; guidance pays one recompute on 2 of 25 steps.

Dispatch: TPU + slab fits VMEM (~6MB) -> Pallas; otherwise XLA.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = bool(os.environ.get("DISTDIFF_PALLAS_INTERPRET"))
_MAX_SLAB_BYTES = 6 * 1024 * 1024


def xla_group_norm(x, scale, bias, groups: int, eps: float = 1e-5):
    """Reference/backward implementation (layout-aware, fp32 stats)."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    cpg = c // groups
    b = x.shape[0]
    n_spatial = 1
    for d in x.shape[1:-1]:
        n_spatial *= d
    x32 = x.astype(jnp.float32)
    red_axes = tuple(range(1, x.ndim - 1))
    s1 = jnp.sum(x32, axis=red_axes)
    s2 = jnp.sum(x32 * x32, axis=red_axes)
    g1 = s1.reshape(b, groups, cpg).sum(-1)
    g2 = s2.reshape(b, groups, cpg).sum(-1)
    n = n_spatial * cpg
    mean_g = g1 / n
    var_g = g2 / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, cpg, axis=1)
    inv_c = jnp.repeat(inv_g, cpg, axis=1)
    a = (inv_c * scale[None, :].astype(jnp.float32)).astype(orig_dtype)
    b_ = (
        bias[None, :].astype(jnp.float32)
        - mean_c * inv_c * scale[None, :].astype(jnp.float32)
    ).astype(orig_dtype)
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return x * a.reshape(shape) + b_.reshape(shape)


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups, eps, n_rows):
    x = x_ref[0]                                   # [HW, C]
    c = x.shape[-1]
    cpg = c // groups
    x32 = x.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=0, keepdims=True)       # [1, C]
    s2 = jnp.sum(x32 * x32, axis=0, keepdims=True)

    # lane-segmented (per-group) reduction via a tiny 0/1 matmul on the MXU
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = ((ch // cpg) == gr).astype(jnp.float32)    # [C, G]
    g1 = jnp.dot(s1, m, preferred_element_type=jnp.float32)  # [1, G]
    g2 = jnp.dot(s2, m, preferred_element_type=jnp.float32)

    n = n_rows * cpg
    mean_g = g1 / n
    var_g = g2 / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # scatter back to channels: [1, G] @ [G, C]
    mean_c = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, m.T, preferred_element_type=jnp.float32)

    scale = scale_ref[0].astype(jnp.float32)[None, :]
    bias = bias_ref[0].astype(jnp.float32)[None, :]
    a = (inv_c * scale).astype(x.dtype)
    b_ = (bias - mean_c * inv_c * scale).astype(x.dtype)
    o_ref[0] = x * a + b_


def _pallas_group_norm(x, scale, bias, groups: int, eps: float):
    b = x.shape[0]
    c = x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    x3 = x.reshape(b, hw, c)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, n_rows=hw),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=INTERPRET,
    )(x3, scale[None, :].astype(x.dtype), bias[None, :].astype(x.dtype))
    return out.reshape(x.shape)


def _fits_vmem(x) -> bool:
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    c = x.shape[-1]
    # per-row VMEM: in + out in dtype, plus x32 and x32*x32 fp32 temps
    per_elem = 2 * x.dtype.itemsize + 8
    return hw * c * per_elem < 12 * 1024 * 1024


def _use_pallas(x, groups) -> bool:
    if os.environ.get("DISTDIFF_FORCE_XLA_GROUPNORM"):
        return False
    c = x.shape[-1]
    if c % 128 or c % groups:
        return False  # lane-aligned channels only; oddballs take XLA
    if not _fits_vmem(x):
        return False
    try:
        return jax.default_backend() == "tpu" or INTERPRET
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm(x, scale, bias, groups: int, eps: float = 1e-5):
    if _use_pallas(x, groups):
        return _pallas_group_norm(x, scale, bias, groups, eps)
    return xla_group_norm(x, scale, bias, groups, eps)


def _gn_fwd(x, scale, bias, groups, eps):
    return group_norm(x, scale, bias, groups, eps), (x, scale, bias)


def _gn_bwd(groups, eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: xla_group_norm(xx, ss, bb, groups, eps),
        x, scale, bias,
    )
    return vjp(g)


group_norm.defvjp(_gn_fwd, _gn_bwd)
