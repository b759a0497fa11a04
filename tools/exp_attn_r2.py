"""Round-2 long-context attention study on the real TPU chip.

Question: where does the Pallas flash kernel (`kernels/flash_attention.py`)
beat XLA's dense attention (materialized [S, S] scores) on real hardware?
Dense attention writes B*H*S*S fp32 scores + softmax to HBM; flash keeps
the score tile in VMEM.  Expectation: at short S the dense path's fused
softmax wins (no pallas fusion barrier); past a crossover S the HBM score
traffic dominates and flash wins.  The answer sets the autotuner policy
for `multi_head_attention` / long-context prefill.

Protocol v2 (docs/BENCH_NOTES.md): full output carried as fori_loop state,
next iteration's input chained off one element, final full sum fetched.

Run from repo root: timeout 3000 python tools/exp_attn_r2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from anakin_tpu.kernels.flash_attention import flash_attention, mha_reference

LOOP_N = 64   # attention at S=4096 is ~ms-scale; 64 in-jit iters >> 30ms RTT


def timed_carry(body, q, k, v):
    def run(q, k, v):
        def it(_, y_prev):
            qq = q + (y_prev[0, 0, 0, 0].astype(jnp.float32)
                      * jnp.float32(1e-30)).astype(q.dtype)
            return body(qq, k, v)

        y = lax.fori_loop(0, LOOP_N, it, body(q, k, v))
        return jnp.sum(y.astype(jnp.float32))

    f = jax.jit(run)
    float(f(q, k, v))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        s = f(q, k, v)
        float(s)
        best = min(best, (time.perf_counter() - t0) / LOOP_N)
    return best * 1e3


def report(tag, ms, flops):
    print(f"{tag:44s} {ms:9.4f} ms  {flops/(ms*1e-3)/1e12:7.1f} TFLOP/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  loop={LOOP_N}", flush=True)

    cases = [
        # (B, H, S, D)
        (8, 16, 512, 128),
        (4, 16, 1024, 128),
        (2, 16, 2048, 128),
        (1, 16, 4096, 128),
        (1, 16, 8192, 128),
    ]
    for B, H, S, D in cases:
        q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
        # causal: ~half the score matrix is live
        flops = 4 * B * H * S * S * D * 0.5

        ms = timed_carry(
            lambda q, k, v: mha_reference(q, k, v, causal=True), q, k, v)
        report(f"dense  B{B} H{H} S{S}", ms, flops)

        for blk in (128, 256, 512):
            if blk > S:
                continue
            try:
                ms = timed_carry(
                    lambda q, k, v, blk=blk: flash_attention(
                        q, k, v, causal=True, block_q=blk, block_k=blk),
                    q, k, v)
                report(f"flash{blk}  B{B} H{H} S{S}", ms, flops)
            except Exception as e:  # noqa: BLE001 — report and move on
                print(f"flash{blk}  B{B} H{H} S{S}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
