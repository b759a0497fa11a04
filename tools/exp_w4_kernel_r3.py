"""Round-3 w4 kernel study: does VMEM nibble-unpack beat w8 on real HBM?

Isolated A/B at 1B-class decode shapes (M=8 activations): for each
[K, N] weight, time (a) bf16 dot, (b) w8 dot (int8 weights, dequant
after), (c) dense_w4 XLA lowering (unpack+dot — known to materialize),
(d) the Pallas matmul_w4 kernel.  Timing per CLAUDE.md: N dependent
iterations inside ONE jit via fori_loop, the carry feeds each step's
input so nothing is DCE'd, and the final scalar is fetched.

Writes artifacts/w4_kernel_r3.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from anakin_tpu.kernels.matmul_w4 import matmul_w4
from anakin_tpu.quant.quantize import _w4_group_quantize

ITERS = 256
M = 8


def timed(fn, *args):
    fn_j = jax.jit(fn)
    s = float(jnp.sum(fn_j(*args)))          # compile + warm
    t0 = time.perf_counter()
    s = float(jnp.sum(fn_j(*args)))
    dt = time.perf_counter() - t0
    return dt / ITERS * 1e6, s                # us per iteration


def run_shape(K, N, group=128):
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(K, N)) * 0.02).astype(np.float32)
    packed, scale, G = _w4_group_quantize(w, group)
    x0 = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
    wb = jnp.asarray(w).astype(jnp.bfloat16)
    q8 = np.clip(np.round(w / (np.abs(w).max(0, keepdims=True) / 127)), -127, 127)
    w8 = jnp.asarray(q8.astype(np.int8))
    s8 = jnp.asarray((np.abs(w).max(0) / 127).astype(np.float32))
    pk = jnp.asarray(packed)
    sc = jnp.asarray(scale)

    def chain(step):
        def body(x):
            def it(i, c):
                y = step(c)                    # [M, N] f32
                # fold y back to an [M, K]-shaped carry (data dependency)
                f = jnp.sum(y, axis=1, keepdims=True) * 1e-6
                return (x * 0.999 + f.astype(x.dtype))
            return lax.fori_loop(0, ITERS, it, x)
        return body

    rows = {}

    def bf16(c):
        return jnp.dot(c, wb, preferred_element_type=jnp.float32)

    def w8dot(c):
        return jnp.dot(c, w8.astype(c.dtype),
                       preferred_element_type=jnp.float32) * s8

    def w4xla(c):
        ng = K // G
        p32 = pk.astype(jnp.int32)
        lo = ((p32 & 0xF) ^ 8) - 8
        hi = p32 >> 4
        wi = jnp.concatenate([lo.reshape(ng, G // 2, N),
                              hi.reshape(ng, G // 2, N)], axis=1)
        wf = (wi.astype(c.dtype) * sc[:, None, :].astype(c.dtype)).reshape(K, N)
        return jnp.dot(c, wf, preferred_element_type=jnp.float32)

    def w4pallas(c):
        return matmul_w4(c, pk, sc, group=G)

    for name, fn in (("bf16", bf16), ("w8", w8dot), ("w4_xla", w4xla),
                     ("w4_pallas", w4pallas)):
        try:
            us, _ = timed(chain(fn), x0)
            # HBM roofline for the weight stream alone (v5e ~819 GB/s)
            wbytes = {"bf16": 2 * K * N, "w8": K * N,
                      "w4_xla": K * N // 2, "w4_pallas": K * N // 2}[name]
            rows[name] = {"us_per_iter": round(us, 2),
                          "weight_stream_us_at_819GBps":
                              round(wbytes / 819e9 * 1e6, 2)}
        except Exception as e:
            rows[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(f"K={K} N={N} {name}: {rows[name]}", flush=True)
    return rows


def main():
    out = {}
    for K, N in ((2048, 4096), (2048, 2048), (2048, 8192), (8192, 2048),
                 (2048, 32000)):
        out[f"K{K}_N{N}"] = run_shape(K, N)
    path = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts",
                        "w4_kernel_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
