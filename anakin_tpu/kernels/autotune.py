"""Autotuner: per-(op, shape, dtype) implementation selection.

Parity with the reference's `SaberImplStrategy` RUNTIME `pick_best`
(`saber/funcs/base.h:85-190`): there, each functor instantiated VENDER_IMPL
(cuDNN) and SABER_IMPL (own kernel) candidates and timed `_runtime_ts=10`
dispatches, caching the winner keyed on param+shape equality
(`base.h:137-162`).  Here the candidates are the XLA-native lowering vs the
Pallas kernel; selection happens at Net build time (shapes are static under
jit, so one decision per node per compile) and persists to a JSON cache so
later sessions skip re-timing.

The tuner runs on whatever backend is active — tune on the real TPU for
deployment; CPU tuning just picks XLA (interpret-mode Pallas never wins),
which is the correct conservative default.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

__all__ = ["AutoTuner", "autotune_graph"]

_RUNTIME_TS = 3   # outer timed calls; each runs 32 chained evals in-jit
# (the reference timed 10 raw dispatches, `base.h:182`; through a remote
# relay raw dispatches measure the RTT, so we amortize inside the program)


_CACHE_SCHEMA = 3  # bump when _node_key fields change; older entries drop


class AutoTuner:
    def __init__(self, cache_path: Optional[str] = None):
        self.cache_path = cache_path
        self.cache: Dict[str, str] = {}
        if cache_path and os.path.exists(cache_path):
            with open(cache_path) as f:
                raw = json.load(f)
            # versioned cache: entries from an older key schema would be
            # orphaned forever (and silently never match), so drop them
            if isinstance(raw, dict) and raw.get("__schema__") == _CACHE_SCHEMA:
                self.cache = raw.get("entries", {})

    def _save(self) -> None:
        if self.cache_path:
            with open(self.cache_path, "w") as f:
                json.dump({"__schema__": _CACHE_SCHEMA,
                           "entries": self.cache}, f, indent=1)

    def pick(self, key: str, candidates: Dict[str, Callable[[], Any]],
             baseline: str = "xla", margin: float = 1.3) -> str:
        """Time each candidate (compile excluded), cache and return winner.

        `margin`: a non-baseline candidate must beat the baseline by this
        factor to be chosen.  Rationale (measured): micro-benchmarks
        over-credit standalone kernels — inside a whole-graph program the
        XLA lowering fuses with its neighbors while a pallas_call is a
        fusion barrier, so isolated wins below ~1.3x lose end-to-end.
        """
        if key in self.cache and self.cache[key] in candidates:
            return self.cache[key]
        times: Dict[str, float] = {}
        for name, thunk in candidates.items():
            try:
                # honest timing through the remote relay: each run's input
                # depends on the previous run's output (chained scalar) and
                # the final scalar is FETCHED — block_until_ready alone can
                # ack early through the relay (docs/BENCH_NOTES.md)
                import jax.numpy as jnp

                s = jnp.float32(0)
                s = thunk(s)  # compile + warm
                float(s)
                t0 = time.perf_counter()
                for _ in range(_RUNTIME_TS):
                    s = thunk(s)
                float(s)
                times[name] = (time.perf_counter() - t0) / _RUNTIME_TS
            except Exception:
                continue
        if not times:
            raise RuntimeError(f"no working candidate for {key}")
        best_name = min(times, key=times.get)
        if (best_name != baseline and baseline in times
                and times[baseline] <= times[best_name] * margin):
            best_name = baseline
        self.cache[key] = best_name
        self._save()
        return best_name


def _node_key(node, shapes) -> str:
    in_shapes = [list(shapes[e].shape) for e in node.inputs]
    return json.dumps({
        "op": node.op,
        "in": in_shapes,
        "strides": node.attr("strides"),
        "groups": node.attr("groups", 1),
        "heads": node.attr("num_heads"),
        "backend": jax.default_backend(),
    }, sort_keys=True)


def _attention_candidates(node, shapes):
    """multi_head_attention / mha_prefill: dense vs the Pallas flash kernel.

    Below S=512 the dense path's XLA-fused softmax always wins (measured,
    docs/BENCH_NOTES.md round-2 attention study) so tuning is skipped
    there.  Non-128-multiple S pads inside the op (`_flash_attn_padded`),
    so long ragged prompts still tune.
    """
    if node.op not in ("multi_head_attention", "mha_prefill"):
        return None
    S = shapes[node.inputs[0]].shape[1]
    if S < 512:
        return None
    return ("dense", ["dense", "flash"])


def autotune_graph(graph, tuner: Optional[AutoTuner] = None):
    """Benchmark implementation candidates per eligible node, set attr `impl`.

    Eligible today: dense_int8 (always), conv2d_int8 with 1x1/s1 or 3x3/s1
    kernels (XLA vs Pallas fused GEMM/conv), and multi_head_attention at
    long sequence (dense vs Pallas flash).  Other nodes keep the XLA
    lowering.
    """
    from ..graph.shape_infer import infer_shapes
    from ..ops.quantized import _pallas_eligible

    tuner = tuner or AutoTuner()
    g = graph.clone()
    shapes = infer_shapes(g)
    rng = np.random.default_rng(0)
    for node in g.nodes.values():
        attn = _attention_candidates(node, shapes)
        if attn is None and not _pallas_eligible(node, g):
            continue
        baseline, impls = attn if attn else ("xla", ["xla", "pallas"])
        key = _node_key(node, shapes)
        # build random operands of the node's real shapes
        args = []
        for e in node.inputs:
            s = shapes[e]
            if e in g.params:
                args.append(jax.numpy.asarray(g.params[e]))
            elif np.issubdtype(np.dtype(s.dtype), np.integer):
                args.append(jax.numpy.asarray(
                    rng.integers(-127, 128, size=s.shape).astype(s.dtype)))
            else:
                args.append(jax.numpy.asarray(
                    rng.normal(size=s.shape).astype(np.float32)))

        from ..ops import get_op

        def make_thunk(impl, node=node, args=args):
            n2 = _with_attr(node, "impl", impl)
            import jax.numpy as jnp
            from jax import lax

            @jax.jit
            def run(s, *xs):
                xs = list(xs)

                # 32 dependency-chained evaluations INSIDE one jit so the
                # relay round trip amortizes away; sum(out) keeps the full
                # result live (no slice-propagation DCE) and feeds the
                # next iteration's input perturbation
                def body(_, s):
                    ys = list(xs)
                    x0 = ys[0]
                    if jnp.issubdtype(x0.dtype, jnp.integer):
                        ys[0] = x0 + (s > 1e30).astype(x0.dtype)
                    else:
                        ys[0] = x0 + (s * 1e-30).astype(x0.dtype)
                    out = get_op(n2.op)(n2, ys)[0]
                    return jnp.sum(out.astype(jnp.float32))

                return lax.fori_loop(0, 32, body, s)

            return lambda s: run(s, *args)

        # the 1.3x margin protects XLA lowerings that FUSE with neighbors
        # against fusion-barrier pallas_calls; dense_w4's XLA lowering
        # materializes the dequantized weights in HBM instead (measured,
        # w4_kernel_r3.json), so there is nothing to protect — ties go to
        # the kernel that reads 0.5 B/weight
        margin = 1.0 if node.op == "dense_w4" else 1.3
        winner = tuner.pick(key, {im: make_thunk(im) for im in impls},
                            baseline=baseline, margin=margin)
        node.attrs["impl"] = winner
    g.applied_passes.append("autotune")
    return g


def _with_attr(node, k, v):
    import copy

    n2 = copy.deepcopy(node)
    n2.attrs[k] = v
    return n2
