"""Pallas TPU flash attention (forward + backward) for the diffusion UNet.

Blockwise online-softmax attention tuned for the shapes this framework runs:
self-attention over 4096/1024/256/64 latent tokens (512² SD-1.5) up to 16384
(SDXL 1024²), and cross-attention against 77 text tokens. This is the
TPU-native replacement for the reference's optional xFormers path
(``generate_data.py:964-975``).

Because DistDiff's energy guidance differentiates *through* the UNet
(``generate_data.py:687-767``), the backward pass is also a Pallas kernel
(split dq / dkv accumulation with the saved logsumexp), wired up via
``jax.custom_vjp``.

Shapes/layout: q ``[B, Tq, H, D]``, k/v ``[B, Tk, H, D]``. Head dim stays
UNPADDED in HBM (D=40 padded to 128 lanes only inside VMEM tiles — padding
in HBM tripled the attention's memory traffic for SD's 40-wide heads);
sequence lengths are padded to the block size and masked. The MXU cost of
a 40-wide contraction equals a 128-wide one (the systolic array processes
K in 128-chunks), so D<128 attention has a hard ~D/128 efficiency ceiling —
the kernel's job is to not add HBM traffic on top of it.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# lse/delta are per-row scalars; store them 8 lanes wide (the fp32 sublane
# granularity) instead of a full 128-lane replica — a [B*H, 4096, 128] f32
# lse was 268MB of pure HBM write per 64^2 self-attention layer.
STAT_LANES = 8
NEG_INF = -1e30

# Interpreter mode lets the kernels run (slowly) off-TPU, e.g. in the CPU
# test suite; the dispatcher in ops.attention only selects Pallas on TPU, so
# this is exercised explicitly by tests.
INTERPRET = bool(os.environ.get("DISTDIFF_PALLAS_INTERPRET"))


def _pallas_call(*args, **kwargs):
    return pl.pallas_call(*args, interpret=INTERPRET, **kwargs)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_blocks(tq: int, tk: int, d: int = 128):
    # Swept on v5e at the SD hot shape (B2 T4096 H8 D40): large kv blocks
    # amortize the online-softmax rescale — bk 2048-4096 runs ~2.5x faster
    # than 512 (scripts/flash_sweep.py). Env overrides for tuning.
    # Large head dims (the VAE's single 512-wide head) scale the caps down
    # to keep kernel VMEM (blocks + f32 scratch, lane-padded) under budget.
    # r2 sweep at CFG-16 T4096 d40 (scripts/flash_sweep.py): bk=4096 (whole
    # kv in one block at the 64^2 stage -> no online rescale) beats 2048 by
    # ~5%; unpadded D beats padded by ~12%. BEST pad=0 bq=512 bk=4096.
    bq_cap = int(os.environ.get("DISTDIFF_FLASH_BQ", "512"))
    bk_cap = int(os.environ.get("DISTDIFF_FLASH_BK", "4096"))
    if _round_up(tk, LANES) <= 256:
        # cross-attention: the whole kv fits ONE block (nk=1, no online
        # rescale) — use big q blocks so the grid isn't thousands of tiny
        # programs (T4096 d40 cross measured 2.6ms/layer at bq=512: pure
        # launch/relayout overhead for 4.3 GFLOP of real work)
        bq_cap = int(os.environ.get("DISTDIFF_FLASH_BQ_CROSS", "2048"))
    dp = max(_round_up(d, LANES), LANES)  # VMEM lane footprint
    if dp > 128:
        shrink = dp // 128
        bq_cap = max(256, bq_cap // shrink)
        bk_cap = max(256, bk_cap // shrink)
    block_q = min(_round_up(tq, LANES), bq_cap)
    block_k = min(_round_up(tk, LANES), bk_cap)
    return block_q, block_k


# ---------------------------------------------------------------- forward

_MAT_L = os.environ.get("DISTDIFF_FLASH_MATL", "1") == "1"
_NO_MAX = os.environ.get("DISTDIFF_FLASH_NOMAX", "0") == "1"
_BF16_P = os.environ.get("DISTDIFF_FLASH_BF16P", "0") == "1"
# constant softmax shift for the no-max path: logits above ~88+C overflow
# fp32 exp; SD attention logits stay well under this (|s| <~ 30 measured),
# and columns more than ~88 below C underflow to the 0 they round to anyway.
_SHIFT_C = 16.0


def _matl(d: int) -> bool:
    """Ones-column l trick: ONLY when D has spare lanes (40 -> 41 is free
    because the MXU pads to 128 regardless; 512 -> 513 would add a whole
    extra 128-lane group to the p@v dot and the accumulator)."""
    return _MAT_L and d % LANES != 0


def _softmax_stats(s, v_dtype, kv_len, padded, use_matl):
    """Shared softmax inner loop for the forward kernels.

    Returns (p_cast, l, m) where ``l`` is None when the ones-column MXU
    trick is on (the caller reads l from the appended column of the
    p@[v|1] product instead — the VPU row-sum over a [bq, bk] block costs
    real time; an extra lane in the second dot is free because the MXU
    pads D=40 to 128 lanes regardless)."""
    if padded:  # static: padded kv needs masking
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    if _NO_MAX:
        m = jnp.full((s.shape[0], 1), _SHIFT_C, jnp.float32)
    else:
        m = jnp.max(s, axis=1, keepdims=True)
    sm = s - m
    if _BF16_P:
        p = jnp.exp(sm.astype(jnp.bfloat16))
    else:
        p = jnp.exp(sm)
    l = None if use_matl else jnp.sum(p.astype(jnp.float32), axis=1,
                                      keepdims=True)
    return p.astype(v_dtype), l, m


def _append_ones(v):
    """[bk, d] -> [bk, d+1] with a trailing ones column (l accumulator)."""
    return jnp.concatenate(
        [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)


def _fwd_kernel_single(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len):
    """One-kv-block softmax: no online rescale, no scratch round trips.
    Used whenever the whole (padded) kv fits a single block — the common
    case after the bk=4096 retune (64^2 self-attention) and for all
    cross-attention (77 kv tokens)."""
    # fold the softmax scale into q ([bq, d] multiply, not [bq, bk])
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    matl = _matl(v_ref.shape[-1])
    p, l, m = _softmax_stats(s, v_ref.dtype, kv_len,
                             kv_len < k_ref.shape[1], matl)
    v = _append_ones(v_ref[0]) if matl else v_ref[0]
    acc = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if matl:
        l = acc[:, -1:]
        acc = acc[:, :-1]
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), lse_ref.shape[1:])


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_s, l_s, acc_s, *, scale, kv_len):
    """Online-softmax kernel (multi-kv-block). With the ones-column trick
    the running row-sum ``l`` lives in the LAST column of ``acc_s`` — the
    same alpha rescale that corrects the numerator corrects it for free —
    and ``l_s`` is unused."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    block_k = k_ref.shape[1]

    matl = _matl(v_ref.shape[-1])

    @pl.when(j == 0)
    def _():
        m_s[...] = jnp.full(m_s.shape, NEG_INF, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)
        if not matl:
            l_s[...] = jnp.zeros(l_s.shape, jnp.float32)

    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bk]
    if kv_len % block_k:  # static: only padded kv needs masking
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_s[:, :1]  # [bq, 1] (all lanes replicated)
    if _NO_MAX:
        m_next = jnp.full((s.shape[0], 1), _SHIFT_C, jnp.float32)
        alpha = jnp.float32(1.0)
    else:
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
    sm = s - m_next
    p = jnp.exp(sm.astype(jnp.bfloat16) if _BF16_P else sm)
    p = p.astype(v_ref.dtype)

    v = _append_ones(v_ref[0]) if matl else v_ref[0]
    acc_s[...] = acc_s[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_s[...] = jnp.broadcast_to(m_next, m_s.shape)
    if not matl:
        l_cur = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        l_s[...] = l_s[...] * alpha + jnp.broadcast_to(l_cur, l_s.shape)

    @pl.when(j == nk - 1)
    def _():
        l_final = acc_s[:, -1:] if matl else l_s[:, :1]
        acc = acc_s[:, :-1] if matl else acc_s[...]
        o_ref[0] = (acc / l_final).astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(
            m_s[:, :1] + jnp.log(l_final), lse_ref.shape[1:])


def _flash_fwd_3d(q, k, v, *, scale, kv_len, block_q, block_k):
    """q [BH, Tqp, Dp], k/v [BH, Tkp, Dp] -> (o, lse [BH,Tqp,STAT_LANES])."""
    bh, tqp, dp = q.shape
    tkp = k.shape[1]
    if tkp == block_k:
        return _pallas_call(
            functools.partial(_fwd_kernel_single, scale=scale, kv_len=kv_len),
            grid=(bh, tqp // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, block_k, dp), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, block_k, dp), lambda b, i: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, dp), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, block_q, STAT_LANES), lambda b, i: (b, i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, tqp, dp), q.dtype),
                jax.ShapeDtypeStruct((bh, tqp, STAT_LANES), jnp.float32),
            ],
        )(q, k, v)
    grid = (bh, tqp // block_q, tkp // block_k)
    o, lse = _pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, STAT_LANES), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tqp, dp), q.dtype),
            jax.ShapeDtypeStruct((bh, tqp, STAT_LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            # +1 lane for the running l when the ones-column trick is on
            pltpu.VMEM((block_q, dp + (1 if _matl(dp) else 0)), jnp.float32),
        ],
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------- backward

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_s,
               *, scale, kv_len):
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    block_k = k_ref.shape[1]

    @pl.when(j == 0)
    def _():
        dq_s[...] = jnp.zeros(dq_s.shape, jnp.float32)

    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kv_len % block_k:
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0][:, :1])  # [bq, bk]

    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0][:, :1]) * scale
    dq_s[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = dq_s[...].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                dk_s, dv_s, *, scale, kv_len, q_len):
    i = pl.program_id(2)  # q-block index (innermost so accumulators persist)
    nq = pl.num_programs(2)
    j = pl.program_id(1)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(i == 0)
    def _():
        dk_s[...] = jnp.zeros(dk_s.shape, jnp.float32)
        dv_s[...] = jnp.zeros(dv_s.shape, jnp.float32)

    q = q_ref[0]  # unscaled: feeds the dk accumulation below
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    k = k_ref[0]
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.exp(s - lse_ref[0][:, :1])  # [bq, bk]
    if kv_len % block_k or q_len % block_q:  # static: padded rows/cols
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        row = i * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        p = jnp.where(
            jnp.logical_and(col < kv_len, row < q_len), p, 0.0
        )

    do = do_ref[0]
    dv_s[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_ref[0][:, :1]) * scale
    dk_s[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_s[...].astype(dv_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dq_in_ref, dq_ref, dk_ref, dv_ref, dk_s, dv_s, *,
                      scale, kv_len, q_len):
    """Single backward kernel: recomputes (s, p) ONCE per (i, j) tile and
    emits all three gradients — the split dq/dkv pair costs 7 dots + 2 exps
    per tile where 5 dots + 1 exp suffice (the s/p recompute and the
    do@v dp dot were duplicated). dk/dv accumulate in VMEM scratch over the
    inner q sweep; dq accumulates THROUGH HBM via an aliased input/output
    block (read-modify-write per visit — at nk<=2 tiles the extra dq
    traffic is ~0.2ms against ~6ms of saved recompute at the CFG-16 bench
    shape)."""
    i = pl.program_id(2)  # q-block index (innermost: dk/dv scratch persists)
    nq = pl.num_programs(2)
    j = pl.program_id(1)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(i == 0)
    def _():
        dk_s[...] = jnp.zeros(dk_s.shape, jnp.float32)
        dv_s[...] = jnp.zeros(dv_s.shape, jnp.float32)

    q = q_ref[0]  # unscaled: feeds the dk accumulation below
    qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
    k = k_ref[0]
    s = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.exp(s - lse_ref[0][:, :1])  # [bq, bk]
    if kv_len % block_k or q_len % block_q:  # static: padded rows/cols
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        row = i * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        p = jnp.where(jnp.logical_and(col < kv_len, row < q_len), p, 0.0)

    do = do_ref[0]
    dv_s[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0][:, :1]) * scale
    dk_s[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dq_in_ref[0] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_s[...].astype(dv_ref.dtype)


_FUSED_BWD = os.environ.get("DISTDIFF_FLASH_FUSED_BWD", "1") == "1"


def _flash_bwd_fused_3d(q, k, v, o, lse, do, *, scale, kv_len, q_len,
                        block_q, block_k, delta_sub=None):
    bh, tqp, dp = q.shape
    tkp = k.shape[1]
    delta = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True
    )
    if delta_sub is not None:
        # lse-cotangent: d lse/d s = p, so a g_lse term folds into the
        # kernel's ds = p*(do.v - delta) as delta -> delta - g_lse.
        delta = delta - delta_sub
    delta = jnp.broadcast_to(delta, (bh, tqp, STAT_LANES))
    # dq accumulates through an aliased fp32 buffer (fp32: nk partial sums)
    dq0 = jnp.zeros((bh, tqp, dp), jnp.float32)

    dq, dk, dv = _pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale, kv_len=kv_len,
                          q_len=q_len),
        grid=(bh, tkp // block_k, tqp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, dp), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, STAT_LANES), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, STAT_LANES), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, dp), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tqp, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, tkp, dp), k.dtype),
            jax.ShapeDtypeStruct((bh, tkp, dp), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dp), jnp.float32),
            pltpu.VMEM((block_k, dp), jnp.float32),
        ],
        input_output_aliases={6: 0},
    )(q, k, v, do, lse, delta, dq0)
    return dq.astype(q.dtype), dk, dv


def _flash_bwd_3d(q, k, v, o, lse, do, *, scale, kv_len, q_len, block_q,
                  block_k, delta_sub=None):
    # The fused kernel holds q/do/dq blocks + k/v blocks + dk/dv out blocks
    # + two [bk, dp] f32 scratch accumulators at once; at dp=512 (the VAE's
    # single 512-wide head) with the dp-shrunk bq=256/bk=1024 that is ~17.3M
    # scoped VMEM — over the 16M budget (remote-compile OOM, r3). The split
    # pair peaks lower per kernel and compiled/benched at exactly these
    # blocks in r2, so big-D takes the split path; the hot UNet dp<=128
    # backward keeps the fused kernel (5 dots + 1 exp vs the pair's 7 + 2).
    if _FUSED_BWD and q.shape[-1] <= 128:
        return _flash_bwd_fused_3d(
            q, k, v, o, lse, do, scale=scale, kv_len=kv_len, q_len=q_len,
            block_q=block_q, block_k=block_k, delta_sub=delta_sub,
        )
    return _flash_bwd_split_3d(
        q, k, v, o, lse, do, scale=scale, kv_len=kv_len, q_len=q_len,
        block_q=block_q, block_k=block_k, delta_sub=delta_sub,
    )


def _flash_bwd_split_3d(q, k, v, o, lse, do, *, scale, kv_len, q_len, block_q,
                        block_k, delta_sub=None):
    bh, tqp, dp = q.shape
    tkp = k.shape[1]
    delta = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True
    )
    if delta_sub is not None:
        delta = delta - delta_sub
    delta = jnp.broadcast_to(delta, (bh, tqp, STAT_LANES))

    dq = _pallas_call(
        functools.partial(_dq_kernel, scale=scale, kv_len=kv_len),
        grid=(bh, tqp // block_q, tkp // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, STAT_LANES), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, STAT_LANES), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tqp, dp), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dp), jnp.float32)],
    )(q, k, v, do, lse, delta)

    dk, dv = _pallas_call(
        functools.partial(_dkv_kernel, scale=scale, kv_len=kv_len, q_len=q_len),
        grid=(bh, tkp // block_k, tqp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, dp), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, STAT_LANES), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, STAT_LANES), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dp), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, dp), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tkp, dp), k.dtype),
            jax.ShapeDtypeStruct((bh, tkp, dp), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dp), jnp.float32),
            pltpu.VMEM((block_k, dp), jnp.float32),
        ],
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ------------------------------------------------------------- public op

def _prep(q, k, v):
    """[B,T,H,D] -> head-major [B*H, Tp, Dp].

    By default D stays UNPADDED in HBM (lanes pad inside VMEM tiles for
    free; padding in HBM 3.2x's the traffic at SD's D=40). Set
    ``DISTDIFF_FLASH_PAD_D=1`` to pad D to the 128-lane width instead
    (A/B switch; both compile and validate on v5e)."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    pad_d = os.environ.get("DISTDIFF_FLASH_PAD_D") == "1"
    dp = max(_round_up(d, LANES), LANES) if pad_d else d
    block_q, block_k = _pick_blocks(tq, tk, dp)
    tqp = _round_up(tq, block_q)
    tkp = _round_up(tk, block_k)

    def to3d(x, tp):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)
        if tp != x.shape[1] or dp != d:
            x = jnp.pad(x, ((0, 0), (0, tp - x.shape[1]), (0, dp - d)))
        return x

    return (to3d(q, tqp), to3d(k, tkp), to3d(v, tkp), block_q, block_k,
            (b, h, tq, tk, d))


def _unprep(x3d, meta):
    b, h, tq, tk, d = meta
    x = x3d[:, :tq, :d].reshape(b, h, tq, d)
    return jnp.transpose(x, (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q, k, v):
    out, _ = _flash_fwd_rule(q, k, v)
    return out


def _flash_fwd_rule(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    q3, k3, v3, bq, bk, meta = _prep(q, k, v)
    o3, lse = _flash_fwd_3d(q3, k3, v3, scale=scale, kv_len=meta[3],
                            block_q=bq, block_k=bk)
    return _unprep(o3, meta), (q3, k3, v3, o3, lse, meta, bq, bk)


def _bwd_blocks(bq: int, bk: int):
    """Backward block sizes: halve down from the forward's until they fit
    the bwd kernels' larger VMEM footprint (dk/dv scratch + two dots — the
    fwd-optimal bk=4096 fails to compile in _dkv_kernel). Halving keeps the
    divisibility of the fwd-padded sequence lengths."""
    bq_cap = int(os.environ.get("DISTDIFF_FLASH_BQ_BWD", "512"))
    bk_cap = int(os.environ.get("DISTDIFF_FLASH_BK_BWD", "2048"))
    while bq > bq_cap and bq % 2 == 0:
        bq //= 2
    while bk > bk_cap and bk % 2 == 0:
        bk //= 2
    return bq, bk


def _flash_bwd_rule(res, g):
    q3, k3, v3, o3, lse, meta, bq, bk = res
    b, h, tq, tk, d = meta
    scale = 1.0 / math.sqrt(d)
    dp = q3.shape[-1]
    g3 = jnp.transpose(g, (0, 2, 1, 3)).reshape(b * h, tq, d)
    g3 = jnp.pad(g3, ((0, 0), (0, q3.shape[1] - tq), (0, dp - d)))
    bq, bk = _bwd_blocks(bq, bk)
    dq3, dk3, dv3 = _flash_bwd_3d(
        q3, k3, v3, o3, lse, g3, scale=scale, kv_len=tk, q_len=tq,
        block_q=bq, block_k=bk,
    )
    dq = _unprep(dq3, meta)
    dk = _unprep(dk3, (b, h, tk, tk, d))
    dv = _unprep(dv3, (b, h, tk, tk, d))
    return dq, dk, dv


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# ------------------------------------------------- head-major public op
#
# Same kernels, but inputs/outputs are ALREADY head-major ``[B, H, T, D]``
# so _prep's (0,2,1,3) relayout (4 passes over ~42MB each at CFG-16 T4096)
# disappears — the producer folds it into its projection einsum's output
# layout instead (scripts/headmajor_probe.py: 91us vs 134us per qkv
# projection at T4096 C320).  Gradients are head-major too.

def _prep_hm(q, k, v):
    """[B,H,T,D] -> [B*H, Tp, Dp] (reshape only; no transpose)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    pad_d = os.environ.get("DISTDIFF_FLASH_PAD_D") == "1"
    dp = max(_round_up(d, LANES), LANES) if pad_d else d
    block_q, block_k = _pick_blocks(tq, tk, dp)
    tqp = _round_up(tq, block_q)
    tkp = _round_up(tk, block_k)

    def to3d(x, tp):
        x = x.reshape(b * h, x.shape[2], d)
        if tp != x.shape[1] or dp != d:
            x = jnp.pad(x, ((0, 0), (0, tp - x.shape[1]), (0, dp - d)))
        return x

    return (to3d(q, tqp), to3d(k, tkp), to3d(v, tkp), block_q, block_k,
            (b, h, tq, tk, d))


def _unprep_hm(x3d, meta):
    b, h, tq, tk, d = meta
    return x3d[:, :tq, :d].reshape(b, h, tq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention_hm(q, k, v):
    """Flash attention over head-major ``[B, H, T, D]`` tensors."""
    out, _ = _flash_fwd_rule_hm(q, k, v)
    return out


def _flash_fwd_rule_hm(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    q3, k3, v3, bq, bk, meta = _prep_hm(q, k, v)
    o3, lse = _flash_fwd_3d(q3, k3, v3, scale=scale, kv_len=meta[3],
                            block_q=bq, block_k=bk)
    return _unprep_hm(o3, meta), (q3, k3, v3, o3, lse, meta, bq, bk)


def _flash_bwd_rule_hm(res, g):
    q3, k3, v3, o3, lse, meta, bq, bk = res
    b, h, tq, tk, d = meta
    scale = 1.0 / math.sqrt(d)
    dp = q3.shape[-1]
    g3 = g.reshape(b * h, tq, d)
    g3 = jnp.pad(g3, ((0, 0), (0, q3.shape[1] - tq), (0, dp - d)))
    bq, bk = _bwd_blocks(bq, bk)
    dq3, dk3, dv3 = _flash_bwd_3d(
        q3, k3, v3, o3, lse, g3, scale=scale, kv_len=tk, q_len=tq,
        block_q=bq, block_k=bk,
    )
    return (_unprep_hm(dq3, meta), _unprep_hm(dk3, (b, h, tk, tk, d)),
            _unprep_hm(dv3, (b, h, tk, tk, d)))


flash_attention_hm.defvjp(_flash_fwd_rule_hm, _flash_bwd_rule_hm)


# ----------------------------------------------- lse-returning public op
#
# Ring (sequence-parallel) attention composes per-shard partial results with
# a logsumexp merge, so the cross-shard combine needs each shard's lse AND a
# backward that propagates the lse cotangent (the softmax normalization is
# global across shards). Returning lse from the kernel is free — the forward
# already writes it for the backward. The lse cotangent folds into the
# existing backward kernels exactly (see delta_sub above): no new kernel.

def flash_attention_lse(q, k, v):
    """Flash attention that also returns the row logsumexp.

    ``q [B,Tq,H,D], k/v [B,Tk,H,D] -> (out [B,Tq,H,D], lse [B,Tq,H] f32)``
    with ``lse = logsumexp_k(q.k * 1/sqrt(D))``. Differentiable in both
    outputs (``jax.custom_vjp``); the building block of
    ``parallel.sp.ring_attention``.
    """
    return _flash_attention_lse(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _flash_attention_lse(q, k, v):
    (out, lse2), _ = _flash_fwd_rule_lse(q, k, v)
    return out, lse2


def _lse_to_2d(lse3, meta):
    b, h, tq, tk, d = meta
    return jnp.transpose(lse3[:, :tq, 0].reshape(b, h, tq), (0, 2, 1))


def _flash_fwd_rule_lse(q, k, v):
    scale = 1.0 / math.sqrt(q.shape[-1])
    q3, k3, v3, bq, bk, meta = _prep(q, k, v)
    o3, lse = _flash_fwd_3d(q3, k3, v3, scale=scale, kv_len=meta[3],
                            block_q=bq, block_k=bk)
    out = (_unprep(o3, meta), _lse_to_2d(lse, meta))
    return out, (q3, k3, v3, o3, lse, meta, bq, bk)


def _flash_bwd_rule_lse(res, g):
    q3, k3, v3, o3, lse, meta, bq, bk = res
    g_out, g_lse = g
    b, h, tq, tk, d = meta
    scale = 1.0 / math.sqrt(d)
    dp = q3.shape[-1]
    tqp = q3.shape[1]
    g3 = jnp.transpose(g_out, (0, 2, 1, 3)).reshape(b * h, tq, d)
    g3 = jnp.pad(g3, ((0, 0), (0, tqp - tq), (0, dp - d)))
    # [B,Tq,H] -> [BH, Tqp, 1]; zero rows in the sequence padding keep the
    # padded-row ds at exactly the g_lse=0 behavior.
    gl = jnp.transpose(g_lse.astype(jnp.float32), (0, 2, 1)).reshape(b * h, tq)
    gl = jnp.pad(gl, ((0, 0), (0, tqp - tq)))[..., None]
    bq, bk = _bwd_blocks(bq, bk)
    dq3, dk3, dv3 = _flash_bwd_3d(
        q3, k3, v3, o3, lse, g3, scale=scale, kv_len=tk, q_len=tq,
        block_q=bq, block_k=bk, delta_sub=gl,
    )
    dq = _unprep(dq3, meta)
    dk = _unprep(dk3, (b, h, tk, tk, d))
    dv = _unprep(dv3, (b, h, tk, tk, d))
    return dq, dk, dv


_flash_attention_lse.defvjp(_flash_fwd_rule_lse, _flash_bwd_rule_lse)
