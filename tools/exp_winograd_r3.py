"""Int8 Winograd F(2x2,3x3) study for the MXU-bound 3x3 conv class.

VERDICT round-2 task 1 names winograd as the one shape-math lever left for
the 3x3 class (reference precedent: `saber_conv_winograd.cpp`, SASS
`winograd_conv_relu`): 2.25x fewer MACs.  On TPU the question is whether
the winograd GEMM shape — 16 batched GEMMs of (M = B*(H/2)^2, K=C, N=Cout),
i.e. CONTRACTION DEPTH C instead of the conv's 9C — sustains more than
rate(conv)/2.25.  The round-2 K-depth study (BENCH_NOTES) says shallow-K
int8 matmuls run far below the conv frontier, so this measures:

  1. conv      — XLA int8 3x3 conv + fused requant (the frontier holder)
  2. wino-ub   — the batched int8 GEMM alone on pre-transformed tensors
                 (transform cost EXCLUDED — an unbeatable upper bound)
  3. wino-e2e  — full F(2x2,3x3): input transform (adds on int16),
                 requant of V to int8, batched GEMM, output transform,
                 requant (only run when the ub is competitive)

Sound carry protocol from tools/exp_conv_r2.py (v2): the FULL output is
the fori_loop carry; >=256 in-jit iterations.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
from jax import lax             # noqa: E402

LOOP_N = 256

# F(2x2,3x3) transforms (Lavin & Gray 2015, public algorithm):
BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [0.5, 0.5, 0.5],
              [0.5, -0.5, 0.5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)


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


def requant(acc, scale=3e-4):
    return jnp.clip(jnp.round(jnp.maximum(
        acc.astype(jnp.float32) * scale, 0.)), -127, 127).astype(jnp.int8)


def conv3x3_int8(x, w):
    acc = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return requant(acc)


def wino_input_transform(x):
    """x int8 [N, H, W, C] (H, W even) -> V int8 [16, N*(H/2)*(W/2), C].

    B^T d B per 4x4 tile at stride 2 — entries are 0/±1, so V is sums of
    <=4 int8 values (int16-safe); production int8 winograd requantizes V
    back to int8 (>>2-style scale) — modeled here with a clip.
    """
    N, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).astype(jnp.int16)
    th, tw = H // 2, W // 2
    # 16 shifted strided views d[a][b]: [N, th, tw, C]
    d = [[xp[:, a:a + 2 * th - 1:2, b:b + 2 * tw - 1:2, :]
          for b in range(4)] for a in range(4)]
    V = []
    for p in range(4):
        for q in range(4):
            acc = None
            for a in range(4):
                if BT[p, a] == 0:
                    continue
                for b in range(4):
                    if BT[q, b] == 0:
                        continue
                    term = d[a][b] if BT[p, a] * BT[q, b] > 0 else -d[a][b]
                    acc = term if acc is None else acc + term
            if acc is None:
                acc = jnp.zeros((N, th, tw, C), jnp.int16)
            V.append(acc)
    V = jnp.stack(V)                                   # [16, N, th, tw, C]
    # int8 requant of the transformed tile (|V| <= 4*127; scale 1/4)
    V8 = jnp.clip((V + 2) >> 2, -127, 127).astype(jnp.int8)
    return V8.reshape(16, N * th * tw, C)


def wino_weight_transform(w):
    """w int8 [3, 3, C, K] -> U int8 [16, C, K] (G g G^T, quantized)."""
    wf = np.asarray(w, np.float32)
    U = np.einsum("pa,abck,qb->pqck", G, wf, G)        # [4, 4, C, K]
    U = U.reshape(16, *U.shape[2:])
    s = max(np.abs(U).max() / 127.0, 1e-6)
    return jnp.asarray(np.clip(np.round(U / s), -127, 127), jnp.int8), s


def wino_gemm(V8, U8):
    return lax.dot_general(
        V8, U8, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)              # [16, M, K]


def wino_output_transform(Mt, N, H, W, K):
    """Mt int32 [16, M, K] -> y int8 [N, H, W, K] via A^T m A + requant."""
    th, tw = H // 2, W // 2
    m = Mt.reshape(4, 4, N, th, tw, K)
    # rows: A^T (2x4) over p; cols over q — 0/±1 entries again
    y = []
    for r in range(2):
        row = []
        for c in range(2):
            acc = None
            for p in range(4):
                if AT[r, p] == 0:
                    continue
                for q in range(4):
                    if AT[c, q] == 0:
                        continue
                    t = m[p, q] if AT[r, p] * AT[c, q] > 0 else -m[p, q]
                    acc = t if acc is None else acc + t
            row.append(acc)                            # [N, th, tw, K]
        y.append(row)
    # interleave the 2x2 outputs back to [N, H, W, K]
    top = jnp.stack([y[0][0], y[0][1]], axis=3)        # [N, th, tw, 2, K]
    bot = jnp.stack([y[1][0], y[1][1]], axis=3)
    full = jnp.stack([top, bot], axis=2)               # [N, th, 2, tw, 2, K]
    out = full.reshape(N, H, W, K)
    return requant(out, scale=3e-4 * 4.0)


def report(tag, ms, fl_conv):
    print(f"{tag:34s} {ms:9.4f} ms  conv-equiv {fl_conv/(ms*1e-3)/1e12:7.1f}"
          " TOP/s", flush=True)
    return {"tag": tag, "ms": round(ms, 4),
            "conv_equiv_tops": round(fl_conv / (ms * 1e-3) / 1e12, 1)}


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  batch={batch}  loop={LOOP_N}",
          flush=True)
    shapes = [("3x3 64@56", 56, 64), ("3x3 128@28", 28, 128),
              ("3x3 256@14", 14, 256), ("3x3 512@7", 7, 512),
              ("3x3 512@14 probe", 14, 512)]
    rows = []
    for name, h, c in shapes:
        x = jnp.asarray(rng.integers(-100, 100, (batch, h, h, c)), jnp.int8)
        w = jnp.asarray(rng.integers(-100, 100, (3, 3, c, c)), jnp.int8)
        fl = 2 * batch * h * h * 9 * c * c
        y0 = jnp.zeros((batch, h, h, c), jnp.int8)
        r = {"shape": name, "B": batch, "H": h, "C": c,
             "conv_gflop": fl / 1e9}

        ms = timed_carry(lambda xx: conv3x3_int8(xx, w), x, y0)
        r["conv"] = report(f"{name} conv", ms, fl)

        # --- winograd GEMM upper bound (pre-transformed operands)
        M = batch * (h // 2) * (h // 2)
        V8 = jnp.asarray(rng.integers(-100, 100, (16, M, c)), jnp.int8)
        U8 = jnp.asarray(rng.integers(-100, 100, (16, c, c)), jnp.int8)
        gy0 = jnp.zeros((16, M, c), jnp.int8)
        ms = timed_carry(lambda vv: requant(wino_gemm(vv, U8)), V8, gy0)
        r["wino_ub"] = report(f"{name} wino-gemm-ub", ms, fl)
        gemm_fl = 2 * 16 * M * c * c
        r["wino_ub"]["raw_gemm_tops"] = round(
            gemm_fl / (ms * 1e-3) / 1e12, 1)

        # --- full winograd e2e (always measured at least once for the
        # record; cheap relative to compile time)
        U8d, _ = wino_weight_transform(np.asarray(w))

        hp = h + (h % 2)                    # F(2x2,..) needs even H/W

        def wino_full(xx):
            if hp != h:
                xx = jnp.pad(xx, ((0, 0), (0, hp - h), (0, hp - h), (0, 0)))
            V = wino_input_transform(xx)
            Mt = wino_gemm(V, U8d)
            y = wino_output_transform(Mt, batch, hp, hp, c)
            return y[:, :h, :h, :] if hp != h else y

        ms = timed_carry(wino_full, x, y0)
        r["wino_e2e"] = report(f"{name} wino-e2e", ms, fl)
        rows.append(r)

    with open("artifacts/winograd_r3.json", "w") as f:
        json.dump({"batch": batch, "loop_n": LOOP_N, "rows": rows}, f,
                  indent=1)
    print("wrote artifacts/winograd_r3.json")


if __name__ == "__main__":
    main()
