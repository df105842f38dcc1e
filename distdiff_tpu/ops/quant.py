"""Opt-in int8 (w8a8) inference ops for the v5e's 2x int8 MXU peak.

The v5e MXU runs int8 x int8 -> int32 at 394 TOPS vs 197 TF/s bf16.
``scripts/int8_probe.py`` (v5e, CFG-16 batch shapes) measured the full
replacement cost — dynamic per-tensor activation quantization + int8
matmul/conv + rescale — winning on every UNet resnet conv (1.3-2.2x;
int8 conv reaches 359-389 TOP/s, 91-99%% of peak) and on the GEGLU /
ff denses.

This is an APPROXIMATE inference mode in the same family as DeepCache
(``--int8`` in bench.py / the CLI; never the official exact-DDIM
metric): quantization error shifts the samples. It therefore applies
ONLY to the plain denoise spans — the guidance leg (which needs exact
energies and backprop) and the VAE stay bf16; no custom VJP is needed
because no gradient flows through a span.

Mechanics: weights stay bf16 in the checkpoint/params tree (nothing
about conversion, TP shardings, or LoRA merging changes); ``QConv`` /
``QDense`` (models/layers.py) quantize weights per-output-channel and
activations per-tensor *inside the program* when the trace-time flag is
on. Weight re-quantization costs one extra pass over the (small) weight
tensor per call — ~4%% of the conv's activation traffic.

Scope note (covers the role of the reference's "faster hardware mode"
flags — TF32 / xFormers, ``generate_data.py:964-975,993-994``).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax import lax

# trace-time flag: read by QConv/QDense while a program that opted in
# (ExpansionPipeline.eps_fn with config.int8) is being traced
_INT8 = {"on": False}


def int8_enabled() -> bool:
    return _INT8["on"]


@contextlib.contextmanager
def int8_inference():
    """Enable the int8 path for ops traced under this context. Use INSIDE
    the function being jitted (trace-time Python control flow)."""
    old = _INT8["on"]
    _INT8["on"] = True
    try:
        yield
    finally:
        _INT8["on"] = old


def _quant_act(x: jnp.ndarray):
    """Dynamic symmetric per-tensor int8 activation quantization."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def _quant_w(w: jnp.ndarray):
    """Per-output-channel (last axis) symmetric int8 weight quantization."""
    red = tuple(range(w.ndim - 1))
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=red) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s  # s: [out]


def qconv(x: jnp.ndarray, w: jnp.ndarray, strides=(1, 1),
          padding=((1, 1), (1, 1)), out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """int8 NHWC/HWIO conv with int32 accumulation and per-channel rescale."""
    qx, sx = _quant_act(x)
    qw, sw = _quant_w(w)
    acc = lax.conv_general_dilated(
        qx, qw, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


def qdot(x: jnp.ndarray, w: jnp.ndarray, out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """int8 [..., in] @ [in, out] with int32 accumulation and rescale."""
    qx, sx = _quant_act(x)
    qw, sw = _quant_w(w)
    acc = lax.dot_general(
        qx, qw, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (sx * sw)).astype(out_dtype)
