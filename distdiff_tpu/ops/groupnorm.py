"""Fused Pallas GroupNorm(+affine, + optional SiLU) — the hottest non-matmul
op in both the UNet and the VAE.

Measured on v5e (full-output-liveness slope harness, scripts/kernel_bench):
a 3x3 conv at the SD hot shape (64^2 x 320, b2) runs ~160us (~48% MXU) and a
ResnetBlock ~330us = two convs + this fused GN/silu — the unfused XLA
GroupNorm paid multiple HBM passes (reduce, reduce, normalize). Two Pallas
paths, both with the activation folded into the final elementwise (a Pallas
custom call is a fusion barrier to XLA, so an unfused trailing silu would
cost a full extra read+write of the slab):

  * single-pass — the [HW, C] slab is staged in VMEM, per-group statistics
    come from two tiny 0/1-matrix matmuls (lane-segmented reductions are
    awkward on the VPU; the MXU does them for free), and affine+act fold
    into the final elementwise. Used when the slab fits VMEM (~6MB).
  * chunked two-pass — for the big slabs (the 512^2/256^2 VAE decoder
    stages: 16-64MB/row, which fell back to XLA before round 3): pass 1
    streams row-chunks accumulating fp32 sum/sumsq in VMEM scratch and
    emits per-channel (a, b) normalization coefficients; pass 2 streams
    chunks again applying x*a+b (+act). 3 HBM slab passes total vs XLA's
    reduce/reduce/normalize(+act) sequence.

Forward-only kernels: the backward (needed on the guidance path) falls back
to the differentiable XLA formula via custom_vjp — spans are fwd-only and
get the full win; guidance pays one recompute on 2 of 25 steps.

Dispatch (r3 verdict — see _use_pallas): XLA everywhere by DEFAULT. The
kernels win in isolation (gn_probe: single-pass 2.2x XLA at [16,32,32,640])
but LOSE in context: a Pallas call is a fusion barrier, and XLA fuses the
GN reductions/normalize+silu into the neighboring convs, netting fewer HBM
passes than any standalone kernel can (UNet fwd CFG-b2: 16.6ms XLA vs
20.5ms Pallas; bench 1.641 vs 1.558 img/s/chip). The kernels stay behind
``DISTDIFF_FORCE_PALLAS_GROUPNORM`` / ``DISTDIFF_GN_CHUNKED`` for
re-evaluation; interpreter-mode tests keep them correct.
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
# pass-1/pass-2 chunk size for the two-pass path (dtype bytes per row-chunk)
_CHUNK_BYTES = int(os.environ.get("DISTDIFF_GN_CHUNK_BYTES", 2 * 1024 * 1024))


def _apply_act(y, act):
    if act is None:
        return y
    if act == "silu":
        # fp32 compute: Mosaic's bf16 sigmoid lowering rejects the mixed
        # broadcast ('vector.broadcast' element-type verification error on
        # v5e, jax 0.x), and fp32 silu is more accurate anyway. XLA fuses
        # the casts; in-kernel it is a register-level convert.
        y32 = y.astype(jnp.float32)
        return (y32 * jax.nn.sigmoid(y32)).astype(y.dtype)
    raise ValueError(f"unsupported groupnorm activation {act!r}")


def xla_group_norm(x, scale, bias, groups: int, eps: float = 1e-5, act=None):
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
    return _apply_act(x * a.reshape(shape) + b_.reshape(shape), act)


# ------------------------------------------------------- single-pass kernel

def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups, eps, n_rows, act):
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
    o_ref[0] = _apply_act(x * a + b_, act)


def _pallas_group_norm(x, scale, bias, groups: int, eps: float, act):
    b = x.shape[0]
    c = x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    x3 = x.reshape(b, hw, c)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, n_rows=hw,
                          act=act),
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


# ---------------------------------------------------- chunked two-pass path

def _gn_stats_kernel(x_ref, scale_ref, bias_ref, o_ref, s1_ref, s2_ref, *,
                     groups, eps, n_rows, nc):
    """Pass 1: accumulate fp32 sum/sumsq over row-chunks (sequential TPU
    grid); on the last chunk reduce to per-group stats and emit the
    per-channel affine coefficients [1, 2, C] = (a, b)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    x32 = x_ref[0].astype(jnp.float32)             # [rows, C]
    s1_ref[...] += jnp.sum(x32, axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(x32 * x32, axis=0, keepdims=True)

    @pl.when(j == nc - 1)
    def _finish():
        c = s1_ref.shape[-1]
        cpg = c // groups
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
        m = ((ch // cpg) == gr).astype(jnp.float32)   # [C, G]
        g1 = jnp.dot(s1_ref[...], m, preferred_element_type=jnp.float32)
        g2 = jnp.dot(s2_ref[...], m, preferred_element_type=jnp.float32)
        n = n_rows * cpg
        mean_g = g1 / n
        var_g = g2 / n - mean_g * mean_g
        inv_g = jax.lax.rsqrt(var_g + eps)
        mean_c = jnp.dot(mean_g, m.T, preferred_element_type=jnp.float32)
        inv_c = jnp.dot(inv_g, m.T, preferred_element_type=jnp.float32)
        scale = scale_ref[0].astype(jnp.float32)[None, :]
        bias = bias_ref[0].astype(jnp.float32)[None, :]
        o_ref[0, 0:1] = inv_c * scale                 # a
        o_ref[0, 1:2] = bias - mean_c * inv_c * scale  # b


def _gn_apply_kernel(x_ref, ab_ref, o_ref, *, act):
    """Pass 2: out = act(x * a + b) per chunk, pure elementwise."""
    x = x_ref[0]
    a = ab_ref[0, 0:1].astype(x.dtype)
    b = ab_ref[0, 1:2].astype(x.dtype)
    o_ref[0] = _apply_act(x * a + b, act)


def _chunk_rows(hw: int, c: int, itemsize: int) -> int:
    """Largest row count dividing ``hw`` whose chunk is within the budget
    (and a multiple of 8 sublanes when possible)."""
    target = max(1, _CHUNK_BYTES // max(1, c * itemsize))
    rows = 1
    d = 1
    while d * d <= hw:
        if hw % d == 0:
            for cand in (d, hw // d):
                if cand <= target and cand > rows:
                    rows = cand
        d += 1
    return rows


def _pallas_group_norm_chunked(x, scale, bias, groups: int, eps: float, act):
    b = x.shape[0]
    c = x.shape[-1]
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    rows = _chunk_rows(hw, c, x.dtype.itemsize)
    nc = hw // rows
    x3 = x.reshape(b, hw, c)
    sb = scale[None, :].astype(x.dtype)
    bb = bias[None, :].astype(x.dtype)
    ab = pl.pallas_call(
        functools.partial(_gn_stats_kernel, groups=groups, eps=eps,
                          n_rows=hw, nc=nc),
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        interpret=INTERPRET,
    )(x3, sb, bb)
    out = pl.pallas_call(
        functools.partial(_gn_apply_kernel, act=act),
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        interpret=INTERPRET,
    )(x3, ab)
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
    # r3 whole-program verdict (scripts/kernel_bench.py --what unet, twice
    # replicated): XLA GroupNorm beats the Pallas kernel IN CONTEXT — UNet
    # fwd CFG-b2 16.6ms (XLA) vs 20.5-22.1ms (Pallas on the c%128 slabs),
    # bench 1.641 vs 1.558 img/s/chip — even though the kernel wins in
    # isolation (gn_probe: 42us vs 94us at [16,32,32,640]). The custom call
    # is a fusion BARRIER: XLA fuses the stat reductions and the
    # normalize+silu into the surrounding convs' epilogues/prologues,
    # saving more HBM passes than the fused kernel does. Pallas GN stays
    # behind DISTDIFF_FORCE_PALLAS_GROUPNORM=1 for re-evaluation on future
    # XLA versions (and INTERPRET mode keeps exercising it in tests).
    if os.environ.get("DISTDIFF_FORCE_XLA_GROUPNORM"):
        return False
    c = x.shape[-1]
    if c % 128 or c % groups:
        return False  # lane-aligned channels only; oddballs take XLA
    if not (os.environ.get("DISTDIFF_FORCE_PALLAS_GROUPNORM") or INTERPRET):
        return False
    try:
        return jax.default_backend() == "tpu" or INTERPRET
    except Exception:
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm(x, scale, bias, groups: int, eps: float = 1e-5, act=None):
    if _use_pallas(x, groups):
        if _fits_vmem(x):
            return _pallas_group_norm(x, scale, bias, groups, eps, act)
        if os.environ.get("DISTDIFF_GN_CHUNKED"):
            # r3 gn_probe verdict: the two-pass kernel streams at only
            # ~220-300 GB/s vs XLA's ~450-600+ effective on the >VMEM VAE
            # slabs (scripts/gn_probe.py; chunked 4.88ms vs XLA 2.49ms at
            # [8,512,512,128]) — XLA stays the default there; the kernel
            # remains behind this flag for future DMA-overlap tuning.
            return _pallas_group_norm_chunked(x, scale, bias, groups, eps,
                                              act)
    return xla_group_norm(x, scale, bias, groups, eps, act)


def _gn_fwd(x, scale, bias, groups, eps, act):
    return group_norm(x, scale, bias, groups, eps, act), (x, scale, bias)


def _gn_bwd(groups, eps, act, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda xx, ss, bb: xla_group_norm(xx, ss, bb, groups, eps, act),
        x, scale, bias,
    )
    return vjp(g)


group_norm.defvjp(_gn_fwd, _gn_bwd)
