"""LLM-class serving: transformer decode with KV cache + weight-only int8.

Beyond-reference capability (the reference predates LLMs): a decoder-only
transformer (GQA + RoPE) built as an engine graph, generated token by
token through cached decode steps.  `weight_only_quantize` halves the
weight bandwidth — the binding constraint of batched decode — with no
calibration data.

Run: python examples/llm_decode.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from anakin_tpu.models.transformer import TransformerConfig
from anakin_tpu.quant import weight_only_quantize
from anakin_tpu.runtime.generate import GenerationSession


def main():
    cfg = TransformerConfig(vocab=1000, embed=256, heads=8, kv_heads=4,
                            layers=4, max_seq=64)
    sess = GenerationSession(cfg, batch=2, precision="fp32")
    prompt = np.array([[1, 5, 9], [2, 4, 8]], np.int32)
    out = sess.generate(prompt, max_new_tokens=8)
    print("generated:", out.tolist())

    # weight-only int8 decode graph (for production decode throughput,
    # drive the whole loop inside one jit — tools/bench_suite.py
    # bench_transformer_decode shows the pattern)
    g8 = weight_only_quantize(sess.decode_graph)
    n_w8 = sum(1 for n in g8.nodes.values() if n.op == "dense_w8")
    print(f"weight-only int8 decode graph: {n_w8} dense_w8 nodes")

    # continuous batching: requests of different lengths share a
    # fixed-batch decode net (chunked prefill, slot reuse)
    from anakin_tpu.runtime import DecodeScheduler

    sched = DecodeScheduler(cfg, batch=2)
    futs = [sched.submit(np.array([1, 5, 9], np.int32), max_new_tokens=4),
            sched.submit(np.array([2, 4], np.int32), max_new_tokens=5),
            sched.submit(np.array([7, 7, 7, 7], np.int32), max_new_tokens=3)]
    for i, f in enumerate(futs):
        print(f"request {i}: {f.result(timeout=300).tolist()}")
    print(f"scheduler ran {sched.steps_run} batched steps for "
          f"{sched.tokens_served} generated tokens")
    sched.close()


if __name__ == "__main__":
    main()
