"""Continuous-batching LLM serving with fused decode windows.

The production LLM serving shape (round-5): a slot-based
`DecodeScheduler` admits each prompt in ONE bucketed prefill dispatch,
runs steady-state decode as ONE device dispatch per K steps
(`fuse_window`), streams tokens (`on_token`), honors per-request
`stop_tokens` (checked on device, windows early-exit), and supports
cancellation — with w4 weight-only quantization (int4 group scales,
the Pallas VMEM-unpack kernel), int8 KV caches, and on-device
temperature/top-k/top-p sampling.  Measured on hardware this path
serves within ~1.1x of the fully in-jit decode rate
(docs/BENCH_NOTES.md round-4/5).

Run: python examples/llm_serve_continuous.py [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from anakin_tpu.models.transformer import TransformerConfig
from anakin_tpu.runtime.decode_scheduler import DecodeScheduler


def main():
    import jax

    cfg = TransformerConfig(vocab=1000, embed=256, heads=8, kv_heads=4,
                            layers=2, max_seq=128)
    # w4's Pallas unpack kernel is TPU Mosaic; on CPU (--cpu smoke) the
    # interpreter would crawl, so the demo drops to w8 there
    on_tpu = jax.default_backend() == "tpu"
    sched = DecodeScheduler(
        cfg, batch=4,
        precision="bf16",
        prefill_mode="bucket",    # whole-prompt admission, ONE dispatch
        fuse_window=8,            # 8 decode steps per dispatch, fused
        weight_only="w4" if on_tpu else "w8",   # int4 / int8 weights
        kv_cache_dtype="int8",    # int8 KV cache rows
    )
    rng = np.random.default_rng(0)
    streamed = []
    requests = [
        dict(prompt=rng.integers(1, 1000, size=p).astype(np.int32),
             max_new_tokens=n, **kw)
        for p, n, kw in (
            (12, 24, {}),                                    # greedy
            (20, 16, dict(temperature=0.8, top_k=40)),       # sampled
            (6, 32, dict(temperature=1.0, top_p=0.9)),       # nucleus
            (16, 8, dict(on_token=streamed.append)),         # streaming
            (10, 20, dict(temperature=0.7, top_k=10, top_p=0.95)),
        )
    ]
    futs = [sched.submit(r.pop("prompt"), **r) for r in requests]
    for i, f in enumerate(futs):
        tokens = f.result(timeout=600)
        print(f"request {i}: {len(tokens)} tokens "
              f"(tail: {tokens[-6:].tolist()})")
    assert len(streamed) == 8       # request 3 streamed all its tokens
    # stop tokens: replay request 0's prompt with one of its own generated
    # tokens as EOS — generation ends early, on device, inside a fused
    # window (the window while_loop exits once every slot stopped)
    first = futs[0].result()
    stop_tok = int(first[12 + 5])           # 6th generated token
    stopped = sched.submit(first[:12], max_new_tokens=24,
                           stop_tokens=(stop_tok,)).result(timeout=600)
    assert stopped[-1] == stop_tok and len(stopped) < 12 + 24
    print(f"stop token {stop_tok}: ended after "
          f"{len(stopped) - 12}/24 tokens")
    print(f"steps={sched.steps_run} (prefill {sched.prefill_steps_run} "
          f"bucket dispatches, fused windows {sched.fused_windows_run}) "
          f"tokens_served={sched.tokens_served} "
          f"kv_arena={sched.cache_bytes() / 1e6:.1f} MB")
    assert sched.fused_windows_run > 0
    assert sched.bucket_prefills_run >= 1
    sched.close()
    print("ok")


if __name__ == "__main__":
    main()
