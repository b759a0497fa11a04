"""Cross-check the analytic scaling model against EXECUTION (round-4).

The llm_decode_tp section of artifacts/scaling_report.json is built from
XLA cost analysis + a v5e roofline — a model.  This tool falsification-
tests two of its claims on the 8-virtual-device CPU mesh, where the
program actually RUNS (CPU ratios, not TPU milliseconds):

1. **Total-work shape.**  On a shared-core host, wall time approximates
   TOTAL work across shards, i.e. wall(n)/wall(1) ~ n*t(n)/t(1) =
   1/efficiency(n).  The fixed layout (embedding E-sharded) predicts a
   flat curve (1/eff <= 1.02 at n=8); the ROUND-3 narrative for the
   unsharded-embedding layout predicted 1.47x at n=8 (the "replicated
   HBM floor").  Execution distinguishes them: a real per-step 131 MB
   table read would add measurable work per device; a row-gather does
   not.  (Measured over four full runs on the 2-core host: n=8 ratios
   for both layouts land in 1.07-1.34 with the LAYOUT RANKING flipping
   between runs — pure host noise; neither shows the old model's
   monotone 1.47x HBM-floor shape.  The floor was cost-model
   attribution, not execution.  docs/BENCH_NOTES.md round-4 honesty
   note.)

2. **Overlap presets.**  Round-4 found the env-flag route FATAL (the
   local parser aborts on TPU-only flag names) and redesigned delivery
   as per-compile `compiler_options`.  The probes record (a) the fatal
   abort of the old route, (b) acceptance of every preset option by the
   real TPU compiler and whether the preset changes the optimized
   single-chip HLO.

Writes a "crosscheck" section into artifacts/scaling_report.json.

Usage: python tools/scaling_crosscheck.py [report.json]
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import anakin_tpu as ak  # noqa: E402
from anakin_tpu.models.transformer import (  # noqa: E402
    TransformerConfig,
    build_transformer_decode_step,
    make_transformer_params,
)
from anakin_tpu.parallel import make_mesh, shard_graph_params  # noqa: E402

CFG = TransformerConfig(vocab=32000, embed=1024, heads=16, kv_heads=8,
                        layers=2, max_seq=512)


def wall_clock_curve(shard_embedding: bool, ns=(1, 2, 4, 8), iters=8):
    """Median wall seconds per decode step for each TP degree, chained
    through a data dependency (the honest-timing protocol, bench.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    params = make_transformer_params(CFG, 0)
    out = []
    for n in ns:
        mesh = make_mesh(jax.devices()[:n], model=n)
        g = build_transformer_decode_step(CFG, 8, params)
        rules = shard_graph_params(g, mesh, min_channels=128)
        if not shard_embedding:
            rules["embed"] = NamedSharding(mesh, P())      # round-3 layout
        cache_sh = NamedSharding(mesh, P(None, "model", None, None))
        ins = {f"cache_{kv}_{i}": cache_sh
               for i in range(CFG.layers) for kv in ("k", "v")}
        net = ak.Net(g, precision="bf16", param_sharding=rules, mesh=mesh,
                     input_shardings=ins)
        shape = (8, CFG.kv_heads, CFG.max_seq, CFG.head_dim)
        feed = {"input": np.zeros((8, 1), np.int32),
                "pos": np.zeros((8,), np.int32)}
        for i in range(CFG.layers):
            feed[f"cache_k_{i}"] = np.zeros(shape, np.float32)
            feed[f"cache_v_{i}"] = np.zeros(shape, np.float32)
        o = net.prediction(feed)                            # compile + warm
        jax.block_until_ready(o)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            o = net.prediction(feed)
            jax.block_until_ready(o)
            ts.append(time.perf_counter() - t0)
        out.append({"n": n, "wall_s": float(np.median(ts))})
    base = out[0]["wall_s"]
    for r in out:
        r["wall_ratio_vs_n1"] = round(r["wall_s"] / base, 3)
    return out


def overlap_flag_check():
    """Round-4 redesign evidence: the overlap preset travels as
    per-compile `compiler_options` (env XLA_FLAGS with TPU-only names
    FATALLY abort a relay-client process -- measured).  Probes, each in a
    subprocess so this CPU-forced process never touches the TPU:

      a) env-flag route is fatal (the bug the redesign removed);
      b) every preset option is accepted by the REAL TPU compiler, and
         the option set changes the optimized single-chip HLO schedule
         (module text differs with the latency-hiding scheduler on).
    """
    from anakin_tpu.parallel.overlap import overlap_compiler_options

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # (a) the env-flag route: expect a FATAL abort (nonzero rc, F-check)
    env_probe = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = "
        "'--xla_tpu_enable_latency_hiding_scheduler=true'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "jax.devices()\nprint('SURVIVED')\n")
    r = subprocess.run([sys.executable, "-c", env_probe],
                       capture_output=True, text=True, timeout=120)
    env_fatal = r.returncode != 0 and "SURVIVED" not in r.stdout

    # (b) TPU: options accepted + HLO schedule difference on the decode step
    tpu_probe = r'''
import sys
sys.path.insert(0, %(repo)r)
import numpy as np, jax
import anakin_tpu as ak
from anakin_tpu.models.transformer import (TransformerConfig,
    build_transformer_decode_step, make_transformer_params)
from anakin_tpu.parallel.overlap import overlap_compiler_options
cfg = TransformerConfig(vocab=1024, embed=256, heads=8, kv_heads=4,
                        layers=1, max_seq=64)
p = make_transformer_params(cfg, 0)
g = build_transformer_decode_step(cfg, 8, p)
shape = (8, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
feed = {"input": np.zeros((8, 1), np.int32), "pos": np.zeros((8,), np.int32),
        "cache_k_0": np.zeros(shape, np.float32),
        "cache_v_0": np.zeros(shape, np.float32)}
texts = {}
for tag, opts in (("off", None), ("on", overlap_compiler_options())):
    net = ak.Net(g, precision="bf16", compiler_options=opts)
    texts[tag] = net.compile(feed).as_text()
print("TPU_PROBE accepted=True hlo_differs=%%s len_off=%%d len_on=%%d"
      %% (texts["off"] != texts["on"], len(texts["off"]), len(texts["on"])))
'''
    r2 = subprocess.run([sys.executable, "-c", tpu_probe % {"repo": repo}],
                        capture_output=True, text=True, timeout=560)
    line = [l for l in r2.stdout.splitlines() if l.startswith("TPU_PROBE")]
    return {"env_flag_route_fatal": env_fatal,
            "env_flag_stderr_tail": r.stderr.strip().splitlines()[-1][-200:]
            if r.stderr.strip() else "",
            "preset_options": overlap_compiler_options("aggressive"),
            "tpu_probe": line[0] if line else
            "rc=%d %s" % (r2.returncode, r2.stderr[-300:])}


def main(path):
    report = json.load(open(path))
    sharded = wall_clock_curve(True)
    unsharded = wall_clock_curve(False)
    model_rows = report["llm_decode_tp"]["rows"]
    model_inv_eff = {r["n_devices"]:
                     round(1.0 / r["efficiency_full_overlap"], 3)
                     for r in model_rows}
    report["crosscheck"] = {
        "method": "8-virtual-CPU-device execution; wall(n)/wall(1) ~ "
                  "n*t(n)/t(1) = 1/efficiency(n) on a shared-core host",
        "config": "E=1024 GQA8 2L b8 vocab=32000 max_seq=512 (exec-sized "
                  "slice of the llm_decode_tp config)",
        "wall_sharded_embed": sharded,
        "wall_unsharded_embed_round3_layout": unsharded,
        "model_predicted_inv_efficiency": model_inv_eff,
        "verdict_round3_narrative": "round-3 model predicted a monotone "
            "1.47x total-work penalty at TP=8 for the unsharded-embedding "
            "layout (per-step 131 MB table read); over four full runs "
            "execution shows BOTH layouts flat within 2-core host noise "
            "(n=8 ratios 1.07-1.34, layout ranking flips between runs) "
            "-> the round-3 mechanism (per-step HBM bandwidth floor) was "
            "full-operand gather attribution in cost analysis, not real "
            "traffic; sharding the table remains right for CAPACITY "
            "(131 MB x n replicated HBM) and for a clean efficiency "
            "model",
        "overlap_flags": overlap_flag_check(),
    }
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print("sharded   ", [r["wall_ratio_vs_n1"] for r in sharded])
    print("unsharded ", [r["wall_ratio_vs_n1"] for r in unsharded])
    print("model 1/eff", model_inv_eff)
    print("wrote crosscheck section ->", path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(__file__), os.pardir, "artifacts",
                      "scaling_report.json"))
