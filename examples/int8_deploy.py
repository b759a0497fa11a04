"""Example: full INT8 deployment pipeline.

calibrate -> quantize -> save model dir -> export StableHLO -> accuracy
check — the reference's `generate_calibrator_*` + int8 deployment flow
(`docs/Manual/int8_design_ch.md`) on TPU.

    python examples/int8_deploy.py /tmp/deploy_dir [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import anakin_tpu as ak
    from anakin_tpu.model_io import export_program, save_model
    from anakin_tpu.models import build_resnet50
    from anakin_tpu.quant import calibrate, quantize_graph, write_scale_table
    from anakin_tpu.tools.accuracy import compare_accuracy

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else "/tmp/anakin_int8_deploy"
    rng = np.random.default_rng(0)
    size = 64

    graph = ak.optimize(build_resnet50(batch=1, image_size=size))
    batches = [{"input": rng.normal(size=(1, size, size, 3)).astype(np.float32)}
               for _ in range(4)]

    print("1. calibrating (KL entropy)...")
    scales = calibrate(graph, batches, method="max")
    write_scale_table(scales, out_dir + "_scales.txt")

    print("2. quantizing...")
    gq = quantize_graph(graph, scales)
    n8 = sum(1 for n in gq.nodes.values() if n.op.endswith("_int8"))
    print(f"   {n8} int8 nodes")

    print("3. saving model dir + StableHLO program...")
    save_model(gq, out_dir)
    net = ak.Net(gq)
    export_program(net, batches[0], out_dir + "/program.shlo")

    print("4. accuracy harness (int8 vs fp32)...")
    rep = compare_accuracy(graph, gq, batches)
    print(f"   top-1 agreement: {rep['top1_agreement']:.3f}, "
          f"top-5 overlap: {rep['top5_overlap']:.3f}")
    print(f"done -> {out_dir}")


if __name__ == "__main__":
    main()
