"""Round-2 conv-efficiency study on the real TPU chip (protocol v2).

Measures every distinct ResNet-50 int8 conv shape and lowering variants.
Protocol: each iteration's FULL requantized output is the fori_loop carry
(while-loop state must materialize — no slice-propagation DCE; this also
matches a real net where every edge is materialized or fused onward), the
next iteration depends on one element, the final full sum is fetched.
LOOP_N=256 makes execution dominate the ~30 ms relay RTT.

Variants:
  conv : int8 conv + fused dequant/relu/requant epilogue  (default path)
  dot  : same as reshaped int8 matmul (1x1 only)
  bf16 : bf16 conv + relu (mixed-precision candidate)
  s2d  : stem 7x7s2 as space-to-depth + 4x4s1 (int8 and bf16)

Run from repo root: timeout 3000 python tools/exp_conv_r2.py [batch]
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


def requant(acc):
    return jnp.clip(jnp.round(jnp.maximum(
        acc.astype(jnp.float32) * 3e-4, 0.)), -127, 127).astype(jnp.int8)


def report(tag, ms, fl):
    print(f"{tag:44s} {ms:9.4f} ms  {fl/(ms*1e-3)/1e12:7.1f} TOP/s",
          flush=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  batch={batch}  loop={LOOP_N}",
          flush=True)

    shapes = [
        ("stem 7x7s2 3->64 @224", 224, 7, 2, 3, 3, 64),
        ("1x1 64->64 @56", 56, 1, 1, 0, 64, 64),
        ("1x1 256->64 @56", 56, 1, 1, 0, 256, 64),
        ("3x3 64->64 @56", 56, 3, 1, 1, 64, 64),
        ("1x1 64->256 @56", 56, 1, 1, 0, 64, 256),
        ("1x1 512->128 @28", 28, 1, 1, 0, 512, 128),
        ("3x3 128->128 @28", 28, 3, 1, 1, 128, 128),
        ("1x1 128->512 @28", 28, 1, 1, 0, 128, 512),
        ("1x1 1024->256 @14", 14, 1, 1, 0, 1024, 256),
        ("3x3 256->256 @14", 14, 3, 1, 1, 256, 256),
        ("1x1 256->1024 @14", 14, 1, 1, 0, 256, 1024),
        ("3x3 512->512 @7", 7, 3, 1, 1, 512, 512),
        ("1x1 2048->512 @7", 7, 1, 1, 0, 2048, 512),
        ("1x1 512->2048 @7", 7, 1, 1, 0, 512, 2048),
    ]

    for name, h, k, st, pd, cin, cout in shapes:
        x = jnp.asarray(rng.integers(-100, 100, (batch, h, h, cin)), jnp.int8)
        w = jnp.asarray(rng.integers(-100, 100, (k, k, cin, cout)), jnp.int8)
        oh = (h + 2 * pd - k) // st + 1
        fl = 2 * batch * oh * oh * k * k * cin * cout
        y0 = jnp.zeros((batch, oh, oh, cout), jnp.int8)

        def conv(xx, w=w, st=st, pd=pd):
            return requant(lax.conv_general_dilated(
                xx, w, window_strides=(st, st),
                padding=[(pd, pd), (pd, pd)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32))

        report(f"{name} [conv]", timed_carry(conv, x, y0), fl)

        if k == 1 and st == 1:
            x2 = jnp.asarray(np.asarray(x).reshape(-1, cin))
            w2 = jnp.asarray(np.asarray(w).reshape(cin, cout))

            def dot(xx, w2=w2):
                return requant(jnp.dot(xx, w2,
                                       preferred_element_type=jnp.int32))

            report(f"{name} [dot]",
                   timed_carry(dot, x2,
                               jnp.zeros((x2.shape[0], cout), jnp.int8)), fl)

        xb = jnp.asarray(rng.standard_normal((batch, h, h, cin)),
                         jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal((k, k, cin, cout)),
                         jnp.bfloat16)

        def bf(xx, wb=wb, st=st, pd=pd):
            y = lax.conv_general_dilated(
                xx, wb, window_strides=(st, st),
                padding=[(pd, pd), (pd, pd)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return jnp.maximum(y, 0).astype(jnp.bfloat16)

        report(f"{name} [bf16]",
               timed_carry(bf, xb,
                           jnp.zeros((batch, oh, oh, cout), jnp.bfloat16)),
               fl)

    # ---- stem space-to-depth variants (exact rewrite, see numerics check)
    fl = 2 * batch * 112 * 112 * 7 * 7 * 3 * 64
    w7 = rng.integers(-100, 100, (7, 7, 3, 64)).astype(np.int8)
    w8 = np.zeros((8, 8, 3, 64), np.int8)
    w8[1:, 1:] = w7
    w4 = jnp.asarray(w8.reshape(4, 2, 4, 2, 3, 64)
                     .transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, 64))
    x = jnp.asarray(rng.integers(-100, 100, (batch, 224, 224, 3)), jnp.int8)

    def s2d(xx, w4=w4):
        n = xx.shape[0]
        xs = xx.reshape(n, 112, 2, 112, 2, 3).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(n, 112, 112, 12)
        return requant(lax.conv_general_dilated(
            xs, w4, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32))

    report("stem [s2d int8]",
           timed_carry(s2d, x, jnp.zeros((batch, 112, 112, 64), jnp.int8)),
           fl)

    xb = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), jnp.bfloat16)
    w4b = jnp.asarray(np.asarray(w4), jnp.bfloat16)

    def s2d_bf(xx, w4b=w4b):
        n = xx.shape[0]
        xs = xx.reshape(n, 112, 2, 112, 2, 3).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(n, 112, 112, 12)
        y = lax.conv_general_dilated(
            xs, w4b, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y, 0).astype(jnp.bfloat16)

    report("stem [s2d bf16]",
           timed_carry(s2d_bf, xb,
                       jnp.zeros((batch, 112, 112, 64), jnp.bfloat16)), fl)

    # fp32-input stem with inline quantize (the real first-layer pipeline)
    xf = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), jnp.float32)
    w7j = jnp.asarray(w7)

    def stem_q(xx, w7j=w7j):
        xq = jnp.clip(jnp.round(xx / 2e-2), -127, 127).astype(jnp.int8)
        return requant(lax.conv_general_dilated(
            xq, w7j, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32))

    report("stem [fp32-in quantize+conv]",
           timed_carry(stem_q, xf,
                       jnp.zeros((batch, 112, 112, 64), jnp.int8)), fl)


if __name__ == "__main__":
    main()
