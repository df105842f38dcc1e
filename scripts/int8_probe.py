"""Probe: does int8 (w8a8, dynamic activation quant) beat bf16 on the v5e?

The v5e MXU has a 2x int8 peak (394 TOPS vs 197 TF/s bf16). This probe
measures, at the official-recipe hot shapes (CFG-16 batch), the REALISTIC
end-to-end replacement cost of an int8 Dense/Conv: dynamic per-tensor
abs-max activation quantization + int8xint8->int32 matmul/conv + rescale,
against the current bf16 op. Weights arrive pre-quantized (as they would
from quantize_params at load time).

Decision input for ops/quant.py: if the int8 conv/dot rows don't land
meaningfully under bf16, the quantized-inference direction is closed.

Run: python scripts/int8_probe.py  (real chip; ~2 min after compile)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from scripts.kernel_bench import device_time


def quant_act(x):
    """Dynamic symmetric per-tensor int8 quantization. Returns (q, scale)."""
    s = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def dot_bf16(x, w):
    return jnp.dot(x, w)


def dot_int8(x, wq, wscale):
    q, s = quant_act(x)
    acc = lax.dot_general(q, wq, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (s * wscale)).astype(jnp.bfloat16)


def conv_bf16(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_int8(x, wq, wscale):
    q, s = quant_act(x)
    acc = lax.conv_general_dilated(
        q, wq, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (s * wscale)).astype(jnp.bfloat16)


def main():
    rng = np.random.RandomState(0)
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 30

    print(f"devices: {jax.devices()}")

    # [M, K, N, tag] — transformer projections / MLP at the CFG-16 step shapes
    dot_shapes = [
        (16 * 4096, 320, 320, "proj 64^2 C320"),
        (16 * 4096, 320, 2560, "geglu 64^2 320->2560"),
        (16 * 4096, 1280, 320, "mlp-out 64^2 1280->320"),
        (16 * 1024, 640, 640, "proj 32^2 C640"),
        (16 * 256, 1280, 1280, "proj 16^2 C1280"),
    ]
    print("\n-- dense: bf16 vs int8 (w8a8 dynamic) --")
    for m, k, n, tag in dot_shapes:
        x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, n) / np.sqrt(k), jnp.bfloat16)
        wq, ws = quant_act(w)
        t_bf = device_time(dot_bf16, [x, w], iters)
        t_i8 = device_time(dot_int8, [x, wq, jnp.float32(ws)], iters)
        fl = 2 * m * k * n
        print(f"{tag:28s} bf16 {t_bf*1e3:7.3f} ms ({fl/t_bf/1e12:5.1f} TF/s) | "
              f"int8 {t_i8*1e3:7.3f} ms ({fl/t_i8/1e12:5.1f} TOP/s) | "
              f"speedup {t_bf/t_i8:4.2f}x")

    # conv shapes: [N, H, W, Cin, Cout, tag] — UNet resnet 3x3s at CFG-16
    conv_shapes = [
        (16, 64, 64, 320, 320, "resnet 64^2 320"),
        (16, 32, 32, 640, 640, "resnet 32^2 640"),
        (16, 16, 16, 1280, 1280, "resnet 16^2 1280"),
        (16, 8, 8, 1280, 1280, "resnet 8^2 1280"),
    ]
    print("\n-- conv3x3: bf16 vs int8 (w8a8 dynamic) --")
    for n_, h, w_, ci, co, tag in conv_shapes:
        x = jnp.asarray(rng.randn(n_, h, w_, ci), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, ci, co) / np.sqrt(9 * ci), jnp.bfloat16)
        wq, ws = quant_act(w)
        try:
            t_bf = device_time(conv_bf16, [x, w], iters)
            t_i8 = device_time(conv_int8, [x, wq, jnp.float32(ws)], iters)
        except Exception as e:  # int8 conv may be unsupported on this backend
            print(f"{tag:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        fl = 2 * n_ * h * w_ * ci * co * 9
        print(f"{tag:28s} bf16 {t_bf*1e3:7.3f} ms ({fl/t_bf/1e12:5.1f} TF/s) | "
              f"int8 {t_i8*1e3:7.3f} ms ({fl/t_i8/1e12:5.1f} TOP/s) | "
              f"speedup {t_bf/t_i8:4.2f}x")


if __name__ == "__main__":
    main()
