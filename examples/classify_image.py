"""Example: classify a JPEG with a built-in model.

Mirrors the reference's `examples/cuda/example_nv_cnn_net.cpp` flow:
build/load graph -> optimize -> Net -> feed image -> top-k.

    python examples/classify_image.py [image.jpg] [--cpu]
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
    from anakin_tpu.models import build_resnet50
    from anakin_tpu.native import decode_jpeg, native_available, preprocess_batch

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        rgb = decode_jpeg(open(args[0], "rb").read())
    else:  # synthetic demo image
        yy, xx = np.mgrid[0:256, 0:256]
        rgb = np.stack([yy, xx, yy + xx], -1).astype(np.uint8)
    batch = preprocess_batch(rgb[None], (224, 224))
    print(f"input {rgb.shape} -> {batch.shape} (native={native_available()})")

    graph = ak.optimize(build_resnet50(batch=1, image_size=224))
    net = ak.Net(graph, precision="bf16")
    probs = np.asarray(net.prediction({"input": batch})[graph.outputs[0]],
                       np.float32)[0]
    top5 = np.argsort(-probs)[:5]
    for i in top5:
        print(f"  class {i:4d}: {probs[i]:.4f}")


if __name__ == "__main__":
    main()
