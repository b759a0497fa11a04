"""Round-5 TPU speculative round-cost sweep (VERDICT task 7).

Measures the `spec_round_fused` FLOOR cost (acceptance ~0 with random
weights -> one round per committed token) across draft capacity x k at
the 8L/E1024 bench class, so the charlm acceptance sweep
(tools/charlm_speculative.py) can project economics for every
configuration instead of round 4's single point.

Rows -> artifacts/spec_sweep_r5.json:
  {draft, draft_ratio, k, round_ms, plain_ms}

Run ALONE on the TPU:  python tools/exp_spec_r5.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def flops_per_token(cfg):
    return cfg.layers * 12 * cfg.embed ** 2 + 2 * cfg.vocab * cfg.embed


def main():
    from anakin_tpu.models.transformer import TransformerConfig
    from anakin_tpu.runtime.speculative import SpeculativeSession
    from tools.bench_suite import bench_transformer_decode

    cfg = TransformerConfig(vocab=16000, embed=1024, heads=16, kv_heads=8,
                            layers=8, max_seq=256)
    drafts = {
        "E256_L2": TransformerConfig(vocab=16000, embed=256, heads=4,
                                     kv_heads=4, layers=2, max_seq=256),
        "E512_L4": TransformerConfig(vocab=16000, embed=512, heads=8,
                                     kv_heads=8, layers=4, max_seq=256),
    }
    # plain-decode baseline at b1 (the latency path speculative competes
    # with), measured fresh in this process
    plain = bench_transformer_decode(batch=1, steps=64)
    plain_ms = plain["ms_per_token_step"]
    print(json.dumps(plain), flush=True)

    prompt = np.arange(1, 17, dtype=np.int32)[None] % cfg.vocab
    rows = []
    for dname, dcfg in drafts.items():
        ratio = flops_per_token(cfg) / flops_per_token(dcfg)
        for k in ((2, 4, 8) if dname == "E256_L2" else (4, 8)):
            sess = SpeculativeSession(cfg, dcfg, k=k, precision="bf16")
            N = 192
            # the WHOLE-LOOP fused program (one dispatch per generation)
            # is the floor measurement — generate_round_fused pays one
            # ~50 ms relay RTT per round and measures the tunnel, not
            # the device (round-4 suite: 54.6 vs 1.21 ms/token)
            try:
                sess.generate_fused(prompt, N)             # compile
                best, rounds = 1e9, 0
                for _ in range(3):
                    r0 = sess.rounds
                    t0 = time.perf_counter()
                    sess.generate_fused(prompt, N)
                    dt = time.perf_counter() - t0
                    rounds = sess.rounds - r0
                    best = min(best, dt / max(1, rounds))
                row = {"draft": dname, "draft_ratio": round(ratio, 2),
                       "k": k, "round_ms": round(best * 1e3, 4),
                       "rounds_per_gen": rounds,
                       "acceptance_floor": round(sess.acceptance_rate, 4),
                       "plain_ms": plain_ms}
            except Exception as e:   # relay-size dependent
                row = {"draft": dname, "k": k,
                       "skipped": f"{type(e).__name__}: {str(e)[:160]}"}
            rows.append(row)
            print(json.dumps(row), flush=True)
    rows = [r for r in rows if "round_ms" in r]
    with open("artifacts/spec_sweep_r5.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote artifacts/spec_sweep_r5.json ({len(rows)} rows)")


if __name__ == "__main__":
    main()
