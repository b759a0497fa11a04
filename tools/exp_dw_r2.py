"""Round-2 depthwise-conv study on the real TPU chip.

MobileNet v1/v2 depthwise shapes, three lowerings:

  bf16   : XLA bf16 grouped conv + relu6            (round-1 winner)
  i8-xla : XLA int8 grouped conv + fused requant    (round-1 loser)
  i8-pl  : Pallas VPU depthwise kernel (kernels/depthwise_int8.py)

Protocol: timed_carry (full-output carry, chained dependency, LOOP_N
in-jit iterations — docs/BENCH_NOTES.md).  Reports ms and effective GB/s
(in+out bytes at the op dtype) vs the 819 GB/s HBM roofline.

Run ALONE on the TPU: timeout 3000 python tools/exp_dw_r2.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

LOOP_N = 256


def timed_carry(body, x, y0):
    def run(x, y0):
        def it(_, y_prev):
            xx = x + (y_prev[(0,) * y_prev.ndim].astype(jnp.float32)
                      > 1e30).astype(x.dtype)
            return body(xx)

        y = lax.fori_loop(0, LOOP_N, it, y0)
        return jnp.sum(y.astype(jnp.float32))

    f = jax.jit(run)
    float(f(x, y0))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        s = f(x, y0)
        float(s)
        best = min(best, (time.perf_counter() - t0) / LOOP_N)
    return best * 1e3


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  batch={batch}  loop={LOOP_N}",
          flush=True)

    # (tag, H, C, stride) — mobilenet v1 + v2 depthwise classes
    shapes = [
        ("dw 112^2 C64 s1", 112, 64, 1),
        ("dw 112^2 C96 s2", 112, 96, 2),
        ("dw 56^2 C128 s1", 56, 128, 1),
        ("dw 56^2 C144 s1", 56, 144, 1),
        ("dw 56^2 C128 s2", 56, 128, 2),
        ("dw 28^2 C256 s1", 28, 256, 1),
        ("dw 28^2 C256 s2", 28, 256, 2),
        ("dw 14^2 C512 s1", 14, 512, 1),
        ("dw 14^2 C576 s1", 14, 576, 1),
        ("dw 7^2 C1024 s1", 7, 1024, 1),
    ]

    from anakin_tpu.kernels.depthwise_int8 import depthwise3x3_int8

    for tag, H, C, s in shapes:
        Ho = H // s
        x8 = jnp.asarray(rng.integers(-127, 128, (batch, H, H, C))
                         .astype(np.int8))
        xb = jnp.asarray(rng.normal(0, 1, (batch, H, H, C))
                         .astype(jnp.bfloat16))
        w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, 1, C))
                         .astype(np.int8))
        wb = jnp.asarray(rng.normal(0, 0.1, (3, 3, 1, C))
                         .astype(jnp.bfloat16))
        ws = jnp.asarray(rng.uniform(0.001, 0.01, (C,)).astype(np.float32))

        bytes_i8 = batch * (H * H + Ho * Ho) * C
        bytes_bf = 2 * bytes_i8

        def bf16_body(x):
            y = lax.conv_general_dilated(
                x, wb, (s, s), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
            return jnp.clip(y, 0, 6).astype(jnp.bfloat16)

        def i8_xla_body(x):
            acc = lax.conv_general_dilated(
                x, w8, (s, s), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C, preferred_element_type=jnp.int32)
            y = jnp.clip(acc.astype(jnp.float32) * (0.05 * ws), 0, 6)
            return jnp.clip(jnp.round(y / 0.047), -127, 127).astype(jnp.int8)

        def i8_pl_body(x):
            return depthwise3x3_int8(
                x, w8, ws, None, stride=s, in_scale=0.05,
                activation="relu6", out_scale=0.047)

        rows = []
        for name, body, x0, nbytes in (
                ("bf16", bf16_body, xb, bytes_bf),
                ("i8-xla", i8_xla_body, x8, bytes_i8),
                ("i8-pl", i8_pl_body, x8, bytes_i8)):
            try:
                y0 = body(x0)
                ms = timed_carry(body, x0, y0)
                gbs = nbytes / (ms * 1e-3) / 1e9
                rows.append(f"{name} {ms:7.4f}ms {gbs:6.0f}GB/s")
            except Exception as e:
                rows.append(f"{name} FAIL {type(e).__name__}: {e}"[:60])
        print(f"{tag:20s} | " + " | ".join(rows), flush=True)


if __name__ == "__main__":
    main()
