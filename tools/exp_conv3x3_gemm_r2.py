"""Round-2b: is XLA's int8 conv rate a frontier, or can im2col+GEMM beat it?

The K-depth study (docs/BENCH_NOTES.md) showed XLA int8 matmul reaching
313 TOP/s at K=8192 while the 3x3 conv class sits at 157-172 TOP/s.  A
3x3/s1 conv IS a GEMM with K=9*C after im2col.  Three measurements per
shape answer whether an im2col lowering pass is worth building:

  conv    : XLA int8 conv + fused requant (current production path)
  im2col  : conv_general_dilated_patches -> int8 dot -> requant
            (what the lowering pass would emit, patch cost included)
  gemm-ub : int8 dot on PRE-materialized patches (GEMM-rate upper bound,
            patch extraction excluded)

If gemm-ub ~= conv, the conv rate is the (M,K,N)-shaped MXU frontier and
the roofline proof is complete.  If gemm-ub >> conv and im2col > conv,
build the pass.

Run from repo root: timeout 3000 python tools/exp_conv3x3_gemm_r2.py
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


def report(tag, ms, macs):
    print(f"{tag:44s} {ms:9.4f} ms  {2*macs/(ms*1e-3)/1e12:7.1f} TOP/s",
          flush=True)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  batch={batch}  loop={LOOP_N}",
          flush=True)

    # the ResNet-50 3x3 classes + one deeper-C probe
    shapes = [(56, 64), (28, 128), (14, 256), (7, 512), (14, 512)]
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))
    for H, C in shapes:
        x = jnp.asarray(rng.integers(-127, 128, size=(batch, H, H, C)),
                        jnp.int8)
        w = jnp.asarray(rng.integers(-127, 128, size=(3, 3, C, C)), jnp.int8)
        w2d = w.reshape(9 * C, C)
        macs = batch * H * H * C * C * 9
        M = batch * H * H

        def conv(x):
            acc = lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return requant(acc)

        report(f"conv    3x3 C{C} @{H}", timed_carry(
            conv, x, jnp.zeros((batch, H, H, C), jnp.int8)), macs)

        def im2col(x):
            p = lax.conv_general_dilated_patches(
                x, (3, 3), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=dn)               # [B, H, H, 9C]
            acc = jnp.dot(p.reshape(M, 9 * C), w2d,
                          preferred_element_type=jnp.int32)
            return requant(acc).reshape(batch, H, H, C)

        report(f"im2col  3x3 C{C} @{H}", timed_carry(
            im2col, x, jnp.zeros((batch, H, H, C), jnp.int8)), macs)

        pat = jnp.asarray(rng.integers(-127, 128, size=(M, 9 * C)), jnp.int8)

        def gemm(p):
            return requant(jnp.dot(p, w2d, preferred_element_type=jnp.int32))

        report(f"gemm-ub M{M} K{9*C} N{C}", timed_carry(
            gemm, pat, jnp.zeros((M, C), jnp.int8)), macs)


if __name__ == "__main__":
    main()
