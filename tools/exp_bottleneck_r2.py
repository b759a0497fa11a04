"""Fused bottleneck megakernel vs unfused XLA chain (carry protocol).

Result (v5e b128, docs/BENCH_NOTES.md): the fused Pallas kernel LOSES at
every stage — XLA's in-context conv chain wins; kept for reproduction.
Run: timeout 3000 python tools/exp_bottleneck_r2.py
"""

import os
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from anakin_tpu.kernels.bottleneck_int8 import bottleneck_int8

LOOP_N = 128

def timed_carry(body, x, y0):
    def run(x, y0):
        def it(_, y_prev):
            xx = x + (y_prev[(0,)*y_prev.ndim].astype(jnp.float32) > 1e30).astype(x.dtype)
            return body(xx)
        y = lax.fori_loop(0, LOOP_N, it, y0)
        return jnp.sum(y.astype(jnp.float32))
    f = jax.jit(run)
    float(f(x, y0))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter(); s = f(x, y0); float(s)
        best = min(best, (time.perf_counter()-t0)/LOOP_N)
    return best*1e3

def rq(y, s):
    return jnp.clip(jnp.round(y * (1.0/s)), -127, 127).astype(jnp.int8)

for (H, C, P) in [(56, 256, 64), (28, 512, 128), (14, 1024, 256)]:
    N = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-80, 80, (N, H, H, C)), jnp.int8)
    wa = jnp.asarray(rng.integers(-60, 60, (C, P)), jnp.int8)
    wb = jnp.asarray(rng.integers(-20, 20, (3, 3, P, P)), jnp.int8)
    wc = jnp.asarray(rng.integers(-60, 60, (P, C)), jnp.int8)
    wsa = jnp.full((P,), 2e-4, jnp.float32)
    wsb = jnp.full((P,), 2e-4, jnp.float32)
    wsc = jnp.full((C,), 2e-4, jnp.float32)
    sc = dict(in_scale=2e-2, a_scale=1.5e-2, b_scale=1.2e-2,
              res_scale=2e-2, out_scale=2.5e-2)
    fl = 2*N*H*H*(C*P + 9*P*P + P*C)

    def unfused(xx):
        ya = lax.conv_general_dilated(xx, wa.reshape(1,1,C,P), (1,1), [(0,0),(0,0)],
            dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.int32)
        qa = rq(jnp.maximum(ya.astype(jnp.float32)*(2e-2*2e-4), 0), 1.5e-2)
        yb = lax.conv_general_dilated(qa, wb, (1,1), [(1,1),(1,1)],
            dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.int32)
        qb = rq(jnp.maximum(yb.astype(jnp.float32)*(1.5e-2*2e-4), 0), 1.2e-2)
        yc = lax.conv_general_dilated(qb, wc.reshape(1,1,P,C), (1,1), [(0,0),(0,0)],
            dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.int32)
        f = yc.astype(jnp.float32)*(1.2e-2*2e-4) + xx.astype(jnp.float32)*2e-2
        return rq(jnp.maximum(f, 0), 2.5e-2)

    y0 = jnp.zeros((N, H, H, C), jnp.int8)
    ms = timed_carry(unfused, x, y0)
    print(f"block H{H} C{C} P{P} [unfused-xla]  {ms:8.4f} ms  {fl/(ms*1e-3)/1e12:6.1f} TOP/s", flush=True)

    def fused(xx):
        return bottleneck_int8(xx, wa, wsa, wb, wsb, wc, wsc, **sc)
    ms = timed_carry(fused, x, y0)
    print(f"block H{H} C{C} P{P} [fused-pallas] {ms:8.4f} ms  {fl/(ms*1e-3)/1e12:6.1f} TOP/s", flush=True)
