"""Real speculative-decoding acceptance on TRAINED models (round 4/5).

Round 4 measured ONE configuration (a 24x-smaller draft at k=4) and
landed exactly at break-even (a=0.256, projected 1.07x).  Round 5
(VERDICT task 7) sweeps the two free variables and adds acceptance-
adaptive k:

  * draft capacity: E64/L1 (~11x fewer FLOPs/token than the E128/L3
    target), E64/L2 (~6x), E96/L2 (~3x) — all trained on the same
    corpus;
  * draft length k in {2, 4, 8} plus the adaptive schedule
    (`SpeculativeSession.generate(adaptive_k=True)`: double k on a
    fully accepted round, halve on zero).

Acceptance is measured through the REAL `SpeculativeSession.generate`
host path on held-out prompts (greedy equality with vanilla decode is
asserted on every prompt; acceptance is a model property identical
across execution modes).  Projected hardware economics combine each
(draft, k)'s measured acceptance with the round-cost model fitted to
the TPU `spec_round_fused` measurements (tools/exp_spec_r5.py rows):
round_ms(draft, k) = c0 + k*c_draft(ratio) + c_verify(k+1).

Writes `charlm_speculative` into artifacts/accuracy_report.json.

Usage: python tools/charlm_speculative.py [--steps 400 --draft-steps 300]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.charlm_accuracy import T, load_corpus, train  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def flops_per_token(cfg):
    """~2x params of the layer stack + heads (relative use only)."""
    layer = 12 * cfg.embed ** 2
    return cfg.layers * layer + 2 * cfg.vocab * cfg.embed


def train_draft(steps, embed, layers, heads, seed=1):
    """Smaller config, same corpus, same trainer."""
    from anakin_tpu.models.transformer import TransformerConfig

    tr, va, V = load_corpus()
    cfg = TransformerConfig(vocab=V, embed=embed, heads=heads,
                            kv_heads=heads, layers=layers, max_seq=T)
    import optax
    import jax.numpy as jnp

    from anakin_tpu.models.transformer import (build_transformer_lm,
                                               make_transformer_params)
    from anakin_tpu.runtime.net import build_forward

    params = make_transformer_params(cfg, seed)
    g = build_transformer_lm(cfg, 16, T, params, with_lengths=False)
    fwd, _ = build_forward(g, "fp32")
    logits_e = g.outputs[0]

    def loss_fn(p, x, y):
        logits = fwd(p, {"input": x})[logits_e]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        return -jnp.take_along_axis(logp, y[..., None], -1).mean()

    opt = optax.adamw(3e-3, weight_decay=1e-4)
    p = {k: jnp.asarray(v) for k, v in g.params.items()}
    state = opt.init(p)

    @jax.jit
    def step(p, state, x, y):
        l, grads = jax.value_and_grad(loss_fn)(p, x, y)
        upd, state = opt.update(grads, state, p)
        return optax.apply_updates(p, upd), state, l

    from tools.charlm_accuracy import batches

    rng = np.random.default_rng(seed)
    for x, y in batches(tr, rng, steps, 16, T):
        p, state, l = step(p, state, jnp.asarray(x), jnp.asarray(y))
    print(f"draft E{embed}/L{layers} final loss {float(l):.3f}", flush=True)
    return cfg, {k: np.asarray(v) for k, v in p.items()}, va


def measure(sess, solo, va, prompts, new_tokens, adaptive=False, rng_seed=3):
    """Acceptance + tokens/round over held-out prompts; greedy exactness
    asserted on every prompt."""
    sess.rounds = sess.tokens_committed = 0
    sess.drafts_accepted = sess.drafts_proposed = 0
    rng = np.random.default_rng(rng_seed)
    P = 32
    for _ in range(prompts):
        i = int(rng.integers(0, len(va) - P - 1))
        prompt = va[i:i + P][None].astype(np.int32)
        out = sess.generate(prompt, max_new_tokens=new_tokens,
                            adaptive_k=adaptive)
        want = solo.generate(prompt, max_new_tokens=new_tokens)
        np.testing.assert_array_equal(out, want)   # exactness on real text
    return (sess.acceptance_rate,
            sess.tokens_committed / max(1, sess.rounds),
            sess.drafts_proposed / max(1, sess.rounds))


def round_cost_model(hw_rows):
    """Round-cost lookup from the TPU spec_fused floor measurements
    (acceptance ~0 -> one round per committed token).  The few measured
    (draft_ratio, k) points are NOISY through the relay, so no fitting:
    each query picks the nearest measured draft ratio, then linearly
    interpolates/extrapolates over k within that draft's rows."""
    if not hw_rows:
        return None

    by_draft = {}
    for r in hw_rows:
        by_draft.setdefault(r["draft_ratio"], []).append(
            (r["k"], r["round_ms"]))

    def cost(ratio, k):
        ratios = sorted(by_draft)
        near = min(ratios, key=lambda x: abs(np.log(x / ratio)))
        pts = sorted(by_draft[near])
        if len(pts) == 1:
            return pts[0][1]
        ks = np.array([p[0] for p in pts], float)
        ms = np.array([p[1] for p in pts], float)
        return float(np.interp(k, ks, ms))

    return cost


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--draft-steps", type=int, default=300)
    ap.add_argument("--prompts", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=24)
    args = ap.parse_args()

    from anakin_tpu.runtime.generate import GenerationSession
    from anakin_tpu.runtime.speculative import SpeculativeSession

    tcfg, tparams, _, va = train(args.steps)
    t_flops = flops_per_token(tcfg)
    solo = GenerationSession(tcfg, batch=1, params=tparams)

    # hardware round-cost measurements, if the TPU sweep has run
    hw_path = os.path.join(REPO, "artifacts", "spec_sweep_r5.json")
    hw_rows = json.load(open(hw_path)) if os.path.exists(hw_path) else []
    cost = round_cost_model(hw_rows)
    # plain-decode baseline measured in the same sweep session (falls
    # back to the round-4 suite value when no sweep artifact exists)
    plain_ms = hw_rows[0]["plain_ms"] if hw_rows else 0.667

    drafts = [("E64_L1", 64, 1, 2), ("E64_L2", 64, 2, 2),
              ("E96_L2", 96, 2, 2)]
    rows = {}
    for name, E, L, H in drafts:
        dcfg, dparams, _ = train_draft(args.draft_steps, E, L, H)
        ratio = t_flops / flops_per_token(dcfg)
        for k in (2, 4, 8):
            sess = SpeculativeSession(tcfg, dcfg, params=tparams,
                                      draft_params=dparams, k=k)
            a, tpr, kbar = measure(sess, solo, va, args.prompts,
                                   args.new_tokens)
            row = {"draft": name, "flops_ratio": round(ratio, 1), "k": k,
                   "acceptance": round(a, 4),
                   "tokens_per_round": round(tpr, 3)}
            if cost:
                rms = cost(ratio, k)
                row["round_ms_model"] = round(rms, 4)
                row["projected_speedup"] = round(plain_ms / (rms / tpr), 3)
            rows[f"{name}_k{k}"] = row
            print(json.dumps(row), flush=True)
        # adaptive k (start k=4, 1..8)
        sess = SpeculativeSession(tcfg, dcfg, params=tparams,
                                  draft_params=dparams, k=4)
        a, tpr, kbar = measure(sess, solo, va, args.prompts,
                               args.new_tokens, adaptive=True)
        row = {"draft": name, "flops_ratio": round(ratio, 1),
               "k": "adaptive(1..8)", "mean_k": round(kbar, 2),
               "acceptance": round(a, 4),
               "tokens_per_round": round(tpr, 3)}
        if cost:
            rms = cost(ratio, kbar)
            row["round_ms_model"] = round(rms, 4)
            row["projected_speedup"] = round(plain_ms / (rms / tpr), 3)
        rows[f"{name}_adaptive"] = row
        print(json.dumps(row), flush=True)

    best = max((r for r in rows.values() if "projected_speedup" in r),
               key=lambda r: r["projected_speedup"], default=None)
    section = {
        "target": f"char-LM E={tcfg.embed} L={tcfg.layers} (trained "
                  f"{args.steps} steps on repo docs)",
        "protocol": "acceptance via SpeculativeSession.generate on "
                    "held-out prompts, greedy-exact vs vanilla decode; "
                    "economics = measured acceptance x round-cost model "
                    "fitted to TPU spec_round_fused floors "
                    "(artifacts/spec_sweep_r5.json)",
        "rows": rows,
        "best": best,
        "hw_rows_fitted": len(hw_rows),
    }
    out_path = os.path.join(REPO, "artifacts", "accuracy_report.json")
    report = json.load(open(out_path)) if os.path.exists(out_path) else {}
    report["charlm_speculative"] = section
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in section.items() if k != "rows"},
                     indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
