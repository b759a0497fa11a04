"""Net — the execution runtime.

TPU-native replacement for the reference's `Net<Ttype, Ptype, RunType>`
executor (`framework/core/net/net.h:36-78`, `net.cpp:215-510`):

  reference                          | here
  -----------------------------------+-----------------------------------
  init(): per-node op factory +      | build(): trace the whole graph into
  InferShape + impl pick_best        | ONE jitted XLA program
  prediction(): flat exec-funcs loop | calling the compiled program
  per-op streams/lanes/events        | XLA:TPU scheduling
  init_memory share_from reuse plan  | XLA buffer assignment (+ the arena
                                     | planner pass for parity/reporting)
  template Ptype (precision)         | runtime `precision` argument +
                                     | per-node overrides (graph.precisions)
  execute_stop_at_node / start_from  | build(stop_at=...) partial programs

Whole-graph compilation is the single biggest TPU-side design decision: the
reference's steady state was "a straight array walk of indirect kernel
launches" (SURVEY.md section 3.1); on TPU the same role is played by one
fused static-shape XLA executable with zero host involvement per step.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.ir import Graph, Node, topological_order
from ..ops import get_op

__all__ = ["Net", "build_forward"]

_FLOAT_DTYPES = (jnp.float32, jnp.bfloat16, jnp.float16, jnp.float64)


def _is_float(x) -> bool:
    return jnp.issubdtype(x.dtype, jnp.floating)


def build_forward(
    graph: Graph,
    precision: str = "fp32",
    stop_at: Optional[str] = None,
    start_from: Optional[str] = None,
    tap_edges: Sequence[str] = (),
) -> Tuple[Callable, List[Node]]:
    """Build the pure forward function `f(params, inputs) -> outputs`.

    `precision`: "fp32" or "bf16" — the global activation/weight compute
    dtype for float tensors (int8 nodes are explicit ops, see
    `anakin_tpu.quant`).  Per-node overrides in `graph.precisions` force a
    node back to fp32 inside a bf16 net (reference: per-node precision via
    `CalibratorParser`, `framework/core/net/calibrator_parse.h`).

    `stop_at` / `start_from`: partial execution cut points (reference:
    `Net::execute_stop_at_node` / `execute_start_from_node`,
    `framework/core/net/net.h:116-190`).  With `start_from`, inputs must
    feed the interior edges consumed at the cut.

    `tap_edges`: extra interior edges to return (reference:
    `Graph::RegistOut`, `framework/graph/graph.h:147`).
    """
    order = topological_order(graph)
    if start_from is not None:
        idx = [i for i, n in enumerate(order) if n.name == start_from]
        if not idx:
            raise KeyError(f"start_from node {start_from!r} not found")
        order = order[idx[0]:]
    if stop_at is not None:
        idx = [i for i, n in enumerate(order) if n.name == stop_at]
        if not idx:
            raise KeyError(f"stop_at node {stop_at!r} not found")
        order = order[: idx[0] + 1]

    compute_dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[precision]
    produced = set()
    for n in order:
        produced.update(n.outputs)
    if stop_at is not None or start_from is not None:
        outputs = list(order[-1].outputs)
    else:
        outputs = list(graph.outputs)
    outputs = list(dict.fromkeys(list(outputs) + list(tap_edges)))

    node_prec: Dict[str, Any] = {}
    for n in order:
        p = graph.precisions.get(n.name)
        if p == "fp32":
            node_prec[n.name] = jnp.float32
        elif p == "bf16":
            node_prec[n.name] = jnp.bfloat16

    def forward(params: Dict[str, jnp.ndarray], inputs: Dict[str, jnp.ndarray]):
        env: Dict[str, jnp.ndarray] = {}
        for k, v in inputs.items():
            env[k] = v.astype(compute_dtype) if _is_float(v) else v

        def lookup(e: str) -> jnp.ndarray:
            if e in env:
                return env[e]
            v = params[e]
            return v.astype(compute_dtype) if _is_float(v) else v

        for node in order:
            want = node_prec.get(node.name, compute_dtype)
            xs = []
            for e in node.inputs:
                v = lookup(e)
                if _is_float(v) and v.dtype != want:
                    v = v.astype(want)
                xs.append(v)
            ys = get_op(node.op)(node, xs)
            for e, y in zip(node.outputs, ys):
                if _is_float(y) and y.dtype != compute_dtype and node.name in node_prec:
                    y = y.astype(compute_dtype)
                env[e] = y
        return {e: lookup(e) for e in outputs}

    return forward, order


class Net:
    """Compiled inference executor over a Graph.

    Usage (mirrors `examples/cuda/example_nv_cnn_net.cpp:20-80` flow):

        graph = build_resnet50(...)
        graph = optimize(graph)
        net = Net(graph, precision="bf16")
        out = net.prediction({"input": x})
    """

    def __init__(
        self,
        graph: Graph,
        precision: str = "fp32",
        param_sharding: Optional[Dict[str, Any]] = None,
        mesh: Optional[Any] = None,
        input_shardings: Optional[Dict[str, Any]] = None,
        stop_at: Optional[str] = None,
        start_from: Optional[str] = None,
        tap_edges: Sequence[str] = (),
        enable_op_timer: bool = False,
        strict_sync: bool = False,
        compiler_options: Optional[Dict[str, str]] = None,
        device_params: Optional[Dict[str, Any]] = None,
        flat_params: bool = False,
    ) -> None:
        graph.validate()
        self.graph = graph
        self.precision = precision
        self.mesh = mesh
        # flat-param mode (round-5 experiment, MEASURED NEGATIVE on the
        # relay): concatenate params into ONE buffer per dtype and unpack
        # with static slices in-program — 2-3 arg handles per dispatch
        # instead of ~300.  Hypothesis was that the per-handle dispatch
        # cost (~3 us/array, the attributed small-batch "regression")
        # would drop; measured (artifacts/flat_params_r5.json): mixed to
        # WORSE (r50 b8 bf16 1.90 vs 1.04 ms/iter) — the weight
        # reshape-from-flat relayouts dominate (the Mosaic unaligned-
        # reshape trap), and the dispatch cost itself is session-noisy.
        # Kept OFF by default as tested infrastructure (bit-exact both
        # precisions); the production answers for dispatch-bound serving
        # remain batching (ContinuousBatcher) and in-graph loops.
        if flat_params and mesh is not None:
            raise ValueError("flat_params does not compose with mesh "
                             "sharding (per-param shardings need "
                             "per-param arrays)")
        self._flat_mode = bool(flat_params)
        # per-edge input sharding overrides (e.g. TP serving: KV caches
        # sharded over heads stay sharded across steps instead of being
        # gathered to the default batch-sharded/replicated layout)
        self._input_shardings = dict(input_shardings or {})
        self._enable_op_timer = enable_op_timer
        self._strict_sync = strict_sync
        self._op_times: Dict[str, List[float]] = {}
        self._node_jits: Dict[str, Callable] = {}
        self.forward, self.order = build_forward(
            graph, precision, stop_at=stop_at, start_from=start_from,
            tap_edges=tap_edges,
        )
        compute_dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[precision]
        # Weights go to device once, cast to the compute dtype up-front so
        # the per-step program does no casting (reference loads weights into
        # GraphGlobalMem once, `framework/graph/graph_global_mem.h`).
        # `device_params` shares an existing device-resident param dict
        # (same edge names/content) between Nets over the same weight set —
        # e.g. the DecodeScheduler's decode/verify/prefill graphs — so the
        # model is resident ONCE, not once per compiled program (reference
        # analog: GraphGlobalMem pooling weights across nets).
        if device_params is not None:
            missing = set(graph.params) - set(device_params)
            if missing:
                raise KeyError(
                    f"device_params missing {sorted(missing)[:4]}...")
            self.params = {k: device_params[k] for k in graph.params}
            self._finish_init(compiler_options)
            return
        host_params = {}
        for k, v in graph.params.items():
            if np.issubdtype(v.dtype, np.floating):
                host_params[k] = v.astype(np.float32 if precision == "fp32" else jnp.bfloat16)
            else:
                host_params[k] = v
        if param_sharding is not None and mesh is not None:
            self.params = {
                k: _put_global(v, param_sharding.get(k, _replicated(mesh)))
                for k, v in host_params.items()
            }
        else:
            self.params = {k: jnp.asarray(v) for k, v in host_params.items()}
        self._finish_init(compiler_options)

    def _finish_init(self, compiler_options):
        import jax

        # per-compile XLA options (collective overlap presets etc.).
        # Explicit argument wins; otherwise the process-wide default set
        # by `parallel.overlap.enable_collective_overlap` applies.  These
        # reach the REAL backend compiler (the env-flag route fatally
        # aborts relay-client processes on TPU-only flags — measured,
        # see parallel/overlap.py).
        if compiler_options is None:
            from ..parallel.overlap import default_compiler_options

            # the preset is TPU-only: CPU (tests / dryruns) rejects
            # xla_tpu_* option names, so the process default applies
            # only where it is valid; an EXPLICIT argument always wins
            if jax.default_backend() == "tpu":
                compiler_options = default_compiler_options() or None
        self.compiler_options = compiler_options
        if compiler_options:
            self._jitted = jax.jit(self.forward,
                                   compiler_options=compiler_options)
        else:
            self._jitted = jax.jit(self.forward)
        if self._flat_mode:
            self._setup_flat(compiler_options)

    def _setup_flat(self, compiler_options):
        """Concatenate params into one buffer per dtype; the program
        unpacks them with STATIC slices (see flat_params in __init__)."""
        import jax

        layout: Dict[str, list] = {}
        for k in sorted(self.params):
            v = self.params[k]
            dt = str(v.dtype)
            entries = layout.setdefault(dt, [])
            off = (entries[-1][1] + entries[-1][2]) if entries else 0
            size = int(np.prod(v.shape)) if v.ndim else 1
            entries.append((k, off, size, tuple(v.shape)))
        self._flat_buffers = {
            dt: jnp.concatenate([jnp.ravel(self.params[k])
                                 for k, _, _, _ in entries])
            for dt, entries in layout.items()}
        frozen = {dt: tuple(entries) for dt, entries in layout.items()}
        fwd = self.forward

        def forward_flat(flat, inputs):
            params = {}
            for dt, entries in frozen.items():
                buf = flat[dt]
                for k, off, size, shape in entries:
                    params[k] = jax.lax.slice(
                        buf, (off,), (off + size,)).reshape(shape)
            return fwd(params, inputs)

        self._jitted_flat = (
            jax.jit(forward_flat, compiler_options=compiler_options)
            if compiler_options else jax.jit(forward_flat))

    # ------------------------------------------------------------- running
    def prediction(self, inputs: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """One forward step.  Re-compilation on new input shapes is handled
        by jax.jit's shape-keyed cache (the reference re-ran InferShape per
        step instead; TPU programs are static-shape)."""
        feed = {k: jnp.asarray(v) for k, v in inputs.items()}
        if self.mesh is not None:
            from ..parallel.mesh import batch_size_of
            from ..parallel.sharding import input_sharding

            ndata = batch_size_of(self.mesh)
            feed = {
                k: _put_global(
                    v,
                    self._input_shardings.get(k)
                    or (input_sharding(self.mesh, v.ndim)
                        if v.ndim and v.shape[0] % ndata == 0
                        else _replicated(self.mesh)))
                for k, v in feed.items()
            }
        if self._enable_op_timer:
            return self._prediction_timed(feed)
        if self._flat_mode:
            out = self._jitted_flat(self._flat_buffers, feed)
        else:
            out = self._jitted(self.params, feed)
        if self._strict_sync:
            out = jax.block_until_ready(out)
            for k, v in out.items():
                a = np.asarray(v)
                if np.issubdtype(a.dtype, np.floating) and not np.isfinite(a).all():
                    raise FloatingPointError(f"non-finite values in output {k!r}")
        return out

    def __call__(self, inputs: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        return self.prediction(inputs)

    # --------------------------------------------------------- op profiling
    def _prediction_timed(self, feed: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Per-op timing mode (reference: ENABLE_OP_TIMER per-op SaberTimer,
        `framework/core/net/net.cpp:418-505`).  Each node runs as its own
        blocking jit call — accurate per-op cost, not production speed."""
        env: Dict[str, jnp.ndarray] = {k: v for k, v in feed.items()}
        compute_dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16}[self.precision]
        for k in list(env):
            if _is_float(env[k]):
                env[k] = env[k].astype(compute_dtype)

        for node in self.order:
            xs = [env[e] if e in env else self.params[e] for e in node.inputs]
            xs = [x.astype(compute_dtype) if _is_float(x) else x for x in xs]
            # per-node jits are cached across timed calls (each jit carries
            # its own shape-keyed compile cache), so repeated profiling runs
            # pay compilation once per node, not once per call
            run = self._node_jits.get(node.name)
            if run is None:
                run = jax.jit(partial(_run_node_list, node))
                self._node_jits[node.name] = run
            t0 = time.perf_counter()
            ys = jax.block_until_ready(run(xs))
            dt = (time.perf_counter() - t0) * 1e3
            self._op_times.setdefault(f"{node.name}({node.op})", []).append(dt)
            for e, y in zip(node.outputs, ys):
                env[e] = y
        return {e: env[e] for e in self.graph.outputs}

    def print_and_reset_optime_summary(self) -> str:
        """Reference parity: `Net::print_and_reset_optime_summary`
        (`framework/core/net/net.h:116-190`)."""
        lines = []
        total = 0.0
        for key, ts in sorted(self._op_times.items(), key=lambda kv: -np.mean(kv[1])):
            m = float(np.mean(ts))
            total += m
            lines.append(f"{key:60s} {m:10.4f} ms (n={len(ts)})")
        lines.append(f"{'TOTAL (sum of op means)':60s} {total:10.4f} ms")
        self._op_times = {}
        report = "\n".join(lines)
        return report

    # ----------------------------------------------------------- utilities
    def compile(self, inputs: Dict[str, Any]):
        """Ahead-of-time compile for given input shapes; returns the
        compiled executable (cost_analysis / as_text for the scaling
        harness).  With a mesh, inputs carry the same shardings
        `prediction` would apply, so the compiled program is the real
        GSPMD-partitioned per-device module."""
        def spec(k, v):
            shape = v.shape if hasattr(v, "shape") else np.shape(v)
            dtype = v.dtype if hasattr(v, "dtype") else np.asarray(v).dtype
            sharding = None
            if self.mesh is not None:
                from ..parallel.mesh import batch_size_of
                from ..parallel.sharding import input_sharding

                ndata = batch_size_of(self.mesh)
                sharding = self._input_shardings.get(k) or (
                    input_sharding(self.mesh, len(shape))
                    if len(shape) and shape[0] % ndata == 0
                    else _replicated(self.mesh))
            return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

        feed = {k: spec(k, v) for k, v in inputs.items()}
        lowered = self._jitted.lower(self.params, feed)
        return lowered.compile()

    def param_bytes(self) -> int:
        """Model weight footprint (reference:
        `GraphGlobalMem::get_sum_mbyte`, `graph.cpp:448-450`)."""
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize for v in self.params.values())


def _run_node_list(node: Node, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
    return get_op(node.op)(node, xs)


def _replicated(mesh):
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec())


def _put_global(v, sharding):
    """device_put that also works on a multi-process mesh: when the
    sharding spans non-addressable devices, every process passes the SAME
    full host array and materializes only its addressable shards
    (reference analog: each service daemon loaded the full model per
    device, `service_daemon.cpp`; here the mesh slices it instead)."""
    if jax.process_count() > 1:
        import numpy as _np

        arr = _np.asarray(v)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])
    return jax.device_put(v, sharding)
