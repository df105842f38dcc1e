"""3x3 convs with tiny channel counts, reformulated for the MXU.

XLA's conv lowering runs at ~1% MXU when one side of the channel
contraction is tiny: the VAE decoder's ``conv_out`` (128->3 at 512^2)
measures 6.3 ms for 14.5 GFLOP on the v5e (scripts/vae_breakdown.py) —
3 output channels fill 3 of the MXU's 128 lanes.  The same pathology hits
the UNet's conv_out (320->4) and conv_in (4->320) and the VAE encoder's
moment head (512->8).

Reformulations (pure XLA, natively differentiable — the transposes of
these einsums have the same shape structure, so the guidance backward
through ``vae.decode`` rides the same fast path):

* small Cout:  z = einsum(x, W[tap*co, ci])  -> [B,H,W,9*Co] — the matmul
  contracts the FULL Ci=128 lanes with 9*Co output columns (27 for Co=3),
  ~6x the lane fill of a direct conv — then 9 shifted slice-adds of the
  cheap [B,H,W,Co] planes reduce over taps.
* small Cin:   im2col over the tiny input — concat 9 shifted copies to
  [B,H,W,9*Ci] (a few MB at Ci=4) and one matmul with K=9*Ci.

Used by models/layers.py:conv3x3_auto; covers the reference's
``vae.decode`` hot path inside ``transform_guidance``
(/root/reference/generate_data.py:701-704) at TPU-native speed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Dispatch thresholds: below these, the einsum formulations beat XLA's
# direct conv on v5e (scripts/vae_breakdown.py, scripts/smallconv_probe.py).
SMALL_COUT = 16
SMALL_CIN = 16


def conv3x3_small_cout(x: jnp.ndarray, w: jnp.ndarray,
                       out_dtype=None) -> jnp.ndarray:
    """SAME 3x3 conv, NHWC x [3,3,Ci,Co], for small Co.

    fp32 accumulation; returns ``out_dtype`` (default: x.dtype).
    """
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    # [3,3,Ci,Co] -> [Ci, 9*Co] with tap-major columns
    wk = jnp.transpose(w, (2, 0, 1, 3)).reshape(ci, 9 * co)
    z = jnp.einsum("bhwc,ck->bhwk", x, wk.astype(x.dtype),
                   preferred_element_type=jnp.float32)  # [B,H,W,9*Co]
    # pad spatially then reduce the 9 taps with shifted slices: output pixel
    # (i,j) sums tap (dy,dx) of z at (i+1-dy, j+1-dx) — i.e. correlation
    # with SAME padding.
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = dy * 3 + dx
            piece = jax.lax.slice(
                zp,
                (0, dy, dx, tap * co),
                (b, dy + h, dx + wd, (tap + 1) * co),
            )
            acc = piece if acc is None else acc + piece
    return acc.astype(out_dtype or x.dtype)


def conv3x3_small_cin(x: jnp.ndarray, w: jnp.ndarray,
                      out_dtype=None) -> jnp.ndarray:
    """SAME 3x3 conv, NHWC x [3,3,Ci,Co], for small Ci (im2col)."""
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + wd, :] for dy in range(3) for dx in range(3)],
        axis=-1,
    )  # [B,H,W,9*Ci]
    wk = w.reshape(9 * ci, co)  # [3,3,Ci,Co] -> tap-major rows: matches cols
    out = jnp.einsum("bhwk,kd->bhwd", cols, wk.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(out_dtype or x.dtype)
