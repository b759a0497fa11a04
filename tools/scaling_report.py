"""Emit the weak-scaling efficiency artifact (artifacts/scaling_report.json).

Runs on the virtual 8-device CPU mesh: lowers the GSPMD-sharded ResNet-50
step for growing meshes (per-device work constant), parses the collectives
XLA actually inserted, and applies the v5e analytic roofline
(anakin_tpu/parallel/scaling.py).  Two configs:

  * dp (data parallel only): the production inference layout — zero
    per-step collectives, efficiency 1.0 by construction.
  * dp x tp2 (tensor parallel pairs): the layout for models too big for
    one chip — efficiency from ICI wire bytes vs MXU time.

Usage: python tools/scaling_report.py [out.json]
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import anakin_tpu as ak  # noqa: E402
from anakin_tpu.models import build_resnet50  # noqa: E402
from anakin_tpu.parallel import (  # noqa: E402
    make_mesh,
    shard_graph_params,
    weak_scaling_report,
)


def make_builder(model_par: int, per_dev_batch: int = 4):
    def build(n):
        mesh = make_mesh(jax.devices()[:n], model=model_par)
        b = per_dev_batch * (n // model_par)
        g = ak.optimize(build_resnet50(batch=b, image_size=64))
        rules = shard_graph_params(g, mesh, min_channels=128)
        net = ak.Net(g, precision="bf16", param_sharding=rules, mesh=mesh)
        return net.compile({"input": np.zeros((b, 64, 64, 3), np.float32)})

    return build


def decode_tp_strong_scaling(ns=(1, 2, 4, 8), batch=8, layers=4):
    """The HARD scaling case (VERDICT round-2 task 6): a 1B-class decode
    step, tensor-parallel over `model=n` — per-step all-reduce wire bytes
    against ONE token's compute.  Megatron layout from shard_graph_params
    (column QKV / row WO / row mlp_down) with KV caches HEAD-sharded via
    Net(input_shardings=...) so they never gather between steps.

    Strong scaling: efficiency_n = t(1) / (n * t(n)) per overlap bound.
    Config is a 4-layer slice of the llm1b bench config (E=2048, 16 heads,
    GQA 8, 32k vocab, max_seq 1024); per-layer wire/compute ratios are
    layer-count invariant, so the efficiency transfers to the full model.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from anakin_tpu.models.transformer import (
        TransformerConfig,
        build_transformer_decode_step,
        make_transformer_params,
    )
    from anakin_tpu.parallel import analyze_compiled

    cfg = TransformerConfig(vocab=32000, embed=2048, heads=16, kv_heads=8,
                            layers=layers, max_seq=1024)
    params = make_transformer_params(cfg, 0)

    def build(n):
        mesh = make_mesh(jax.devices()[:n], model=n)      # pure TP
        g = build_transformer_decode_step(cfg, batch, params)
        rules = shard_graph_params(g, mesh, min_channels=128)
        cache_sh = NamedSharding(mesh, P(None, "model", None, None))
        ins = {f"cache_{kv}_{i}": cache_sh
               for i in range(cfg.layers) for kv in ("k", "v")}
        net = ak.Net(g, precision="bf16", param_sharding=rules, mesh=mesh,
                     input_shardings=ins)
        shape = (batch, cfg.kv_heads, cfg.max_seq, cfg.head_dim)
        feed = {"input": np.zeros((batch, 1), np.int32),
                "pos": np.zeros((batch,), np.int32)}
        for i in range(cfg.layers):
            feed[f"cache_k_{i}"] = np.zeros(shape, np.float32)
            feed[f"cache_v_{i}"] = np.zeros(shape, np.float32)
        return net.compile(feed)

    rows, base = [], None
    for n in ns:
        a = analyze_compiled(build(n))
        a["n_devices"] = n
        if base is None:
            base = a
        for bound in ("full_overlap", "no_overlap"):
            t0, tn = base[f"t_step_{bound}_s"], a[f"t_step_{bound}_s"]
            a[f"efficiency_{bound}"] = (t0 / (n * tn)) if tn > 0 else 1.0
        a["collective_kinds"] = sorted({c["kind"]
                                        for c in a.pop("collectives")})
        rows.append(a)
    return {"model": f"llm1b-slice decode (E=2048 GQA8 {layers}L, b{batch},"
                     " bf16, head-sharded KV)",
            "mode": "tp_strong_scaling",
            "rows": rows,
            "efficiency_at_max_full_overlap":
                rows[-1]["efficiency_full_overlap"],
            "efficiency_at_max_no_overlap":
                rows[-1]["efficiency_no_overlap"]}


def main(out_path: str) -> None:
    report = {
        "model": "resnet50 bf16 (image 64, 4 img/device)",
        "dp": weak_scaling_report(make_builder(1), ns=(1, 2, 4, 8)),
        "dp_x_tp2": weak_scaling_report(make_builder(2), ns=(2, 4, 8)),
        "llm_decode_tp": decode_tp_strong_scaling(),
    }
    for k in ("dp", "dp_x_tp2", "llm_decode_tp"):
        e = report[k]["efficiency_at_max_full_overlap"]
        print(f"{k}: efficiency@8dev (full overlap) = {e:.3f}")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(__file__), os.pardir, "artifacts",
                      "scaling_report.json"))
