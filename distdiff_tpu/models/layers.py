"""Shared Flax building blocks for the diffusion models.

TPU-first conventions used throughout the model zoo:
  * NHWC layout everywhere (XLA's native conv layout on TPU; the reference's
    torch models are NCHW — we do not mirror that).
  * bf16 activations / fp32 normalization statistics by default.
  * Attention runs through ``distdiff_tpu.ops.attention`` which dispatches to
    a Pallas flash-attention kernel on TPU (the role xFormers plays in the
    reference, ``generate_data.py:964-975``) and a pure-XLA path elsewhere.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from distdiff_tpu.ops import attention as attn_op


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep embedding, fp32.

    Matches the SD convention (flip_sin_to_cos=True, downscale_freq_shift=0):
    output is [cos | sin] halves over ``dim//2`` frequencies.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


class TimestepMLP(nn.Module):
    """time_embedding: Linear -> SiLU -> Linear, fp32 in / model dtype out."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Dense(self.dim, dtype=jnp.float32, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, dtype=jnp.float32, name="linear_2")(emb)
        return emb.astype(self.dtype)


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics regardless of input dtype.

    ``act='silu'`` folds the following activation INTO the kernel: a Pallas
    custom call is a fusion barrier to XLA, so a separate trailing
    ``nn.silu`` costs a full extra HBM read+write of the slab."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Dispatches to the fused Pallas kernel on TPU (ONE HBM pass per
        # batch row for VMEM-sized slabs, a chunked two-pass for the big
        # 512^2 VAE stages; see distdiff_tpu/ops/groupnorm.py) with a
        # TPU-layout-aware XLA fallback: never materialize [..., G, C/G]
        # tensors whose ~10-40-wide C/G lane dim pads ~10x.
        from distdiff_tpu.ops.groupnorm import group_norm

        c = x.shape[-1]
        groups = min(self.num_groups, c)
        while c % groups:  # largest divisor <= num_groups (torch requires
            groups -= 1    # divisibility; tiny test configs may not divide)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm(x, scale, bias, groups, self.epsilon, self.act)


class SmallConv3x3(nn.Module):
    """3x3 SAME conv for tiny channel counts — drop-in for ``nn.Conv``
    (same ``kernel``/``bias`` leaves, HWIO kernel layout).

    XLA's direct conv runs at ~1% MXU when Ci or Co is tiny (the VAE
    decoder's 128->3 ``conv_out``: 6.3 ms for 14.5 GFLOP at 512^2 b8 —
    scripts/vae_breakdown.py); ``ops/smallconv`` reformulates as a
    lane-filling einsum. Compute is ``dtype`` with fp32 accumulation;
    result is cast to ``out_dtype`` (default ``dtype``)."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    out_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from distdiff_tpu.ops import smallconv

        ci = x.shape[-1]
        co = self.out_channels
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),  # fan_in = 9*Ci, as nn.Conv
            (3, 3, ci, co), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (co,), jnp.float32)
        xb = x.astype(self.dtype)
        if co <= smallconv.SMALL_COUT:
            y = smallconv.conv3x3_small_cout(xb, kernel, out_dtype=jnp.float32)
        else:
            y = smallconv.conv3x3_small_cin(xb, kernel, out_dtype=jnp.float32)
        y = y + bias
        return y.astype(self.out_dtype or self.dtype)


class QConv(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3))`` (same ``kernel``/``bias``
    leaves, HWIO layout, same bf16 promote-then-conv numerics) that routes
    through the int8 w8a8 path when ``ops.quant.int8_inference()`` is
    active at trace time — the v5e's int8 MXU peak is 2x bf16 and the
    probe measured 1.3-2.2x on the UNet resnet convs (ops/quant.py)."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from distdiff_tpu.ops import quant

        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        if quant.int8_enabled():
            y = quant.qconv(x, kernel, strides=self.strides, padding=pad,
                            out_dtype=self.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return y + bias.astype(self.dtype)


class QDense(nn.Module):
    """Drop-in for ``nn.Dense`` (same leaves/numerics) with the trace-time
    int8 w8a8 switch — see QConv."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from distdiff_tpu.ops import quant

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        if quant.int8_enabled():
            y = quant.qdot(x, kernel, out_dtype=self.dtype)
        else:
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class ResnetBlock(nn.Module):
    """GN -> SiLU -> Conv -> (+time) -> GN -> SiLU -> Conv with skip."""

    out_channels: int
    use_time_emb: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        residual = x
        h = GroupNorm(dtype=self.dtype, act="silu", name="norm1")(x)
        h = QConv(self.out_channels, (3, 3), dtype=self.dtype, name="conv1")(h)
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = GroupNorm(dtype=self.dtype, act="silu", name="norm2")(h)
        h = QConv(self.out_channels, (3, 3), dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            # 1x1 conv as a channel Dense: XLA lowers the conv form to ~16%
            # MXU at the 64^2 hot shape vs ~95% for the dot
            # (scripts/conv_probe.py); converter squeezes [O,I,1,1] weights.
            residual = nn.Dense(
                self.out_channels, dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return h + residual


class Downsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return QConv(
            self.out_channels, (3, 3), strides=(2, 2), dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        # 2x nearest upsample as broadcast+reshape: ONE linear-copy pass.
        # jax.image.resize(method="nearest") lowers to a gather here — 7x
        # slower fwd (11.7 vs ~1.7ms at 256->512 x256 b8) and a scatter in
        # the VJP on the guidance backward path (scripts/vae_breakdown.py).
        x = jnp.broadcast_to(
            x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
        ).reshape(b, h * 2, w * 2, c)
        return QConv(self.out_channels, (3, 3), dtype=self.dtype, name="conv")(x)


class HeadMajorProj(nn.Module):
    """Projection straight into head-major ``[B, H, T, D]`` in ONE einsum.

    The parameter tree matches ``nn.Dense(use_bias=False)`` exactly (a
    ``kernel`` of shape ``[C, H*D]``) so checkpoints, the weight converter
    and the TP PartitionSpecs are unchanged; only the output layout differs
    — the ``[B,T,H,D] -> head-major`` relayout the flash kernel would
    otherwise do folds into the dot's output layout (43-51us/projection at
    the T4096/T1024 stages, scripts/headmajor_probe.py).
    """

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (c, self.heads * self.head_dim), jnp.float32,
        )
        w = w.reshape(c, self.heads, self.head_dim).astype(self.dtype)
        return jnp.einsum("btc,chd->bhtd", x.astype(self.dtype), w)


class Attention(nn.Module):
    """Multi-head attention over flattened spatial (or token) positions.

    Self-attention when ``context`` is None, cross-attention otherwise.
    Long-sequence stages project qkv head-major (see ``HeadMajorProj``);
    the output side keeps transpose+Dense, which beats the fused output
    einsum at every probed stage (out_t 70us vs out_hm 124us at T4096).
    """

    num_heads: int
    head_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        out_dim = self.out_dim or x.shape[-1]
        b, tq, _ = x.shape
        tk = ctx.shape[1]

        if attn_op.wants_head_major(tq):
            proj = functools.partial(
                HeadMajorProj, self.num_heads, self.head_dim, dtype=self.dtype
            )
            q = proj(name="to_q")(x)
            k = proj(name="to_k")(ctx)
            v = proj(name="to_v")(ctx)
            out = attn_op.attention_hm(q, k, v)          # [B, H, Tq, D]
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, tq, inner)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
            q = q.reshape(b, tq, self.num_heads, self.head_dim)
            k = k.reshape(b, tk, self.num_heads, self.head_dim)
            v = v.reshape(b, tk, self.num_heads, self.head_dim)
            out = attn_op.attention(q, k, v)
            out = out.reshape(b, tq, inner)
        return nn.Dense(out_dim, dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = QDense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        h = GEGLU(dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return QDense(dim, dtype=self.dtype, name="net_2")(h)


class TransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU-FF, all residual."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        attn_kw = dict(num_heads=self.num_heads, head_dim=self.head_dim, dtype=self.dtype)
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + Attention(**attn_kw, name="attn1")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Attention(**attn_kw, name="attn2")(h, context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(dtype=self.dtype, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """GN -> 1x1 proj_in -> N transformer blocks over HW tokens -> proj_out."""

    num_heads: int
    head_dim: int
    depth: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(dtype=self.dtype, name="norm")(x)
        # 1x1 projections as Dense over tokens: XLA lowers a 1x1 conv at the
        # 64^2x320 hot shape to ~16% MXU vs ~95% for the equivalent matmul
        # (scripts/conv_probe.py). Same math; converter squeezes diffusers'
        # [C,C,1,1] conv weights (SD-1.x) / transposes linear (SDXL).
        x = x.reshape(b, h * w, c)
        x = nn.Dense(c, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.depth):
            x = TransformerBlock(
                num_heads=self.num_heads,
                head_dim=self.head_dim,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(x, context)
        x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
        return x.reshape(b, h, w, c) + residual
