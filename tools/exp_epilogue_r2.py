"""Round-2 experiment 2: epilogue-fusion ablations for slow int8 convs.

PROTOCOL (v2, sound): the previous slice probe let XLA slice-propagate
through the conv and dead-code-eliminate the measurement (raw-s32 showed
an impossible 248 TOP/s).  Here each iteration's FULL output is the
fori_loop carry — the while-loop state must be materialized, nothing can
be sliced away — and the next iteration's input depends on one element of
it.  Final full-sum fetched on the host.

Ablations per shape:
  raw-s32 : conv only, s32 output
  f32-out : conv + dequant to f32
  requant : dequant + relu + round + clip + int8 (the real pipeline)
  pallas  : kernels/matmul_int8.py fused GEMM (1x1 shapes only)
  bf16    : bf16 conv + relu (is int8 worth it here?)

Run from repo root: timeout 3000 python tools/exp_epilogue_r2.py
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
    """body(x_dep, y_prev) -> y ; returns ms/iter."""

    def run(x, y0):
        def it(_, y_prev):
            xx = x + (y_prev[(0,) * y_prev.ndim].astype(jnp.float32)
                      > 1e30).astype(x.dtype)
            return body(xx)

        y = lax.fori_loop(0, LOOP_N, it, y0)
        return jnp.sum(y.astype(jnp.float32))

    f = jax.jit(run)
    s = f(x, y0)
    float(s)
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        s = f(x, y0)
        float(s)
        best = min(best, (time.perf_counter() - t0) / LOOP_N)
    return best * 1e3


def report(tag, ms, fl):
    print(f"{tag:40s} {ms:9.4f} ms  {fl/(ms*1e-3)/1e12:7.1f} TOP/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    batch = 128

    shapes = [
        ("1x1 64->256 @56", 56, 1, 1, 0, 64, 256),
        ("1x1 128->512 @28", 28, 1, 1, 0, 128, 512),
        ("3x3 128->128 @28", 28, 3, 1, 1, 128, 128),
        ("stem 7x7s2 3->64", 224, 7, 2, 3, 3, 64),
    ]
    for name, h, k, st, pd, cin, cout in shapes:
        x = jnp.asarray(rng.integers(-100, 100, (batch, h, h, cin)), jnp.int8)
        w = jnp.asarray(rng.integers(-100, 100, (k, k, cin, cout)), jnp.int8)
        oh = (h + 2 * pd - k) // st + 1
        fl = 2 * batch * oh * oh * k * k * cin * cout

        def conv(xx):
            return lax.conv_general_dilated(
                xx, w, window_strides=(st, st),
                padding=[(pd, pd), (pd, pd)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        ms = timed_carry(conv, x, jnp.zeros((batch, oh, oh, cout), jnp.int32))
        report(f"{name} [raw-s32]", ms, fl)

        ms = timed_carry(lambda xx: conv(xx).astype(jnp.float32) * 3e-4,
                         x, jnp.zeros((batch, oh, oh, cout), jnp.float32))
        report(f"{name} [f32-out]", ms, fl)

        def requant(xx):
            return jnp.clip(jnp.round(jnp.maximum(
                conv(xx).astype(jnp.float32) * 3e-4, 0.)),
                -127, 127).astype(jnp.int8)

        ms = timed_carry(requant, x,
                         jnp.zeros((batch, oh, oh, cout), jnp.int8))
        report(f"{name} [requant]", ms, fl)

        if k == 1:
            from anakin_tpu.kernels.matmul_int8 import matmul_int8

            x2 = jnp.asarray(np.asarray(x).reshape(-1, cin))
            w2 = jnp.asarray(np.asarray(w).reshape(cin, cout))
            wsc = jnp.full((cout,), 3e-4, jnp.float32)

            def pl(xx):
                return matmul_int8(xx, w2, wsc, None, None, in_scale=1.0,
                                   activation="relu", out_scale=2e-2,
                                   out_dtype=jnp.float32)

            ms = timed_carry(pl, x2,
                             jnp.zeros((x2.shape[0], cout), jnp.int8))
            report(f"{name} [pallas]", ms, fl)

        xb = jnp.asarray(rng.standard_normal((batch, h, h, cin)),
                         jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((k, k, cin, cout)),
                         jnp.bfloat16)

        def bf(xx):
            y = lax.conv_general_dilated(
                xx, wb, window_strides=(st, st),
                padding=[(pd, pd), (pd, pd)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return jnp.maximum(y, 0).astype(jnp.bfloat16)

        ms = timed_carry(bf, xb,
                         jnp.zeros((batch, oh, oh, cout), jnp.bfloat16))
        report(f"{name} [bf16]", ms, fl)


if __name__ == "__main__":
    main()
