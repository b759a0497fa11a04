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


def main(out_path: str) -> None:
    report = {
        "model": "resnet50 bf16 (image 64, 4 img/device)",
        "dp": weak_scaling_report(make_builder(1), ns=(1, 2, 4, 8)),
        "dp_x_tp2": weak_scaling_report(make_builder(2), ns=(2, 4, 8)),
    }
    for k in ("dp", "dp_x_tp2"):
        e = report[k]["efficiency_at_max_full_overlap"]
        print(f"{k}: efficiency@8dev (full overlap) = {e:.3f}")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(__file__), os.pardir, "artifacts",
                      "scaling_report.json"))
