"""Pipeline-parallel inference: stage-partitioned graphs with microbatching.

Completes the parallelism matrix (PP): a graph is cut into N stages along
the topological order (FLOP-balanced), each stage compiled for its own
device; microbatches stream through the stages GPipe-style — stage i runs
microbatch m while stage i+1 runs microbatch m-1, overlap coming from
XLA's async dispatch (each per-stage jitted call returns immediately;
device_put edges activations between devices).

Best suited to models too big for one chip; on this rig it is validated on
the virtual CPU mesh.  For TPU pods the stage boundary transfer rides ICI.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..graph.ir import Graph, topological_order
from ..runtime.net import Net

__all__ = ["split_graph", "PipelinedNet"]


def split_graph(graph: Graph, n_stages: int) -> List[Graph]:
    """Cut the graph into `n_stages` FLOP-balanced stage subgraphs.

    Each stage's inputs are the edges crossing into it; its outputs are the
    edges crossing out (plus graph outputs it produces).
    """
    from ..runtime.profiler import flops_estimate

    order = topological_order(graph)
    costs = flops_estimate(graph)
    total = sum(costs[n.name]["flops"] + 1.0 for n in order)
    per_stage = total / n_stages

    stages_nodes: List[List] = [[] for _ in range(n_stages)]
    acc, si = 0.0, 0
    for node in order:
        c = costs[node.name]["flops"] + 1.0
        if acc + c > per_stage * (si + 1) and si < n_stages - 1 and stages_nodes[si]:
            si += 1
        stages_nodes[si].append(node)
        acc += c

    graphs: List[Graph] = []
    produced_before = set(graph.inputs)
    for si, nodes in enumerate(stages_nodes):
        g = Graph(f"{graph.name}_stage{si}")
        node_names = {n.name for n in nodes}
        produced_here = set()
        for n in nodes:
            produced_here.update(n.outputs)
        # inputs: edges consumed here but produced earlier (or graph inputs)
        needed = set()
        for n in nodes:
            for e in n.inputs:
                if e in graph.params:
                    g.params[e] = graph.params[e]
                elif e not in produced_here:
                    needed.add(e)
        from ..graph.shape_infer import infer_shapes

        shapes = infer_shapes(graph)
        for e in sorted(needed):
            g.add_input(e, shapes[e].shape, str(shapes[e].dtype))
        for n in nodes:
            g.add_node(n.name, n.op, n.inputs, n.outputs, **dict(n.attrs))
        # outputs: edges produced here and consumed later, or graph outputs
        consumed_later = set()
        for later in stages_nodes[si + 1:]:
            for n in later:
                consumed_later.update(n.inputs)
        for e in sorted(produced_here):
            if e in consumed_later or e in graph.outputs:
                g.mark_output(e)
        g.scales = dict(graph.scales)
        g.validate()
        graphs.append(g)
    return graphs


class PipelinedNet:
    """Run stage graphs on a chain of devices with microbatch streaming."""

    def __init__(self, graph: Graph, devices: Sequence[jax.Device],
                 precision: str = "fp32"):
        self.devices = list(devices)
        self.stage_graphs = split_graph(graph, len(self.devices))
        self.graph = graph
        self.nets = []
        for g, d in zip(self.stage_graphs, self.devices):
            net = Net(g, precision=precision)
            net.params = {k: jax.device_put(v, d) for k, v in net.params.items()}
            self.nets.append(net)

    def prediction(self, inputs: Dict[str, Any],
                   microbatches: int = 2) -> Dict[str, jnp.ndarray]:
        """Split the batch into microbatches, stream through the stages.

        Per-stage dispatch is async: by issuing microbatch m+1's stage-0
        work before microbatch m has finished the later stages, the chain
        pipelines (GPipe inference schedule).
        """
        feed = {k: jnp.asarray(v) for k, v in inputs.items()}
        B = next(iter(feed.values())).shape[0]
        m = min(microbatches, B)
        assert B % m == 0, (B, m)
        mb = B // m
        # split
        mbs = [
            {k: v[i * mb:(i + 1) * mb] for k, v in feed.items()}
            for i in range(m)
        ]
        # stream: issue stage s for microbatch i as soon as inputs exist
        results: List[Dict[str, jnp.ndarray]] = [dict(x) for x in mbs]
        for i in range(m):
            env = results[i]
            for s, net in enumerate(self.nets):
                stage_in = {k: jax.device_put(env[k], self.devices[s])
                            for k in self.stage_graphs[s].inputs}
                out = net._jitted(net.params, stage_in)
                env.update(out)
        # gather graph outputs
        outs: Dict[str, jnp.ndarray] = {}
        for e in self.graph.outputs:
            outs[e] = jnp.concatenate([r[e] for r in results], axis=0)
        return outs
