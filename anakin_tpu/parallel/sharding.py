"""GSPMD sharding rules for inference graphs.

This is the piece the reference never had (SURVEY.md section 2.10 /
BASELINE.json north star): weights tensor-sharded over the mesh, activations
batch-sharded, XLA inserting all-gather / reduce-scatter over ICI and
overlapping them with MXU compute.

Rules (the standard Megatron-style inference sharding, expressed as
NamedShardings over HWIO / (in,out) weights):

  * conv2d weights  HWIO: shard O over `model` -> output activations are
    channel-sharded; the next 1x1/3x3 conv consumes I sharded, producing a
    psum (reduce) — XLA handles the pairing.  We keep it simpler and robust:
    shard O of every conv with O >= threshold, replicate the rest.
  * dense weights (in, out): shard `out` over `model` (column parallel);
    the classifier's output stays sharded until the (tiny) softmax gather.
  * biases / per-channel vectors follow the out-channel sharding.
  * activations: batch axis over `data`.

`shard_graph_params` returns {param_edge: NamedSharding} for Net's
`param_sharding` argument; `input_sharding` gives the activation spec.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..graph.ir import Graph
from .mesh import DATA_AXIS, MODEL_AXIS, batch_axes

__all__ = ["shard_graph_params", "input_sharding", "output_sharding"]


def _divisible(dim: int, by: int) -> bool:
    return by > 0 and dim % by == 0


def _col_sharded_upstream(graph, producers, rules, edge, col) -> bool:
    """True when `edge` is produced by a column-sharded matmul — directly,
    or through an elementwise combine of column-sharded matmuls (the
    SwiGLU gate: eltwise-mul of up and gate denses).  Such an input is
    already model-sharded on its feature dim, so the consuming dense can
    row-shard and psum (Megatron pairing through the gate)."""
    prod = producers.get(edge)
    if prod is None:
        return False
    if prod.op in ("dense", "dense_int8", "dense_w8", "dense_w4"):
        return rules.get(prod.inputs[1]) == col
    if prod.op in ("eltwise", "eltwise_op", "eltwise_act"):
        return all(_col_sharded_upstream(graph, producers, rules, e, col)
                   for e in prod.inputs)
    if prod.op == "activation":
        return _col_sharded_upstream(graph, producers, rules,
                                     prod.inputs[0], col)
    return False


def shard_graph_params(
    graph: Graph,
    mesh: Mesh,
    min_channels: int = 128,
) -> Dict[str, NamedSharding]:
    """Per-param NamedSharding map: model-parallel out-channel sharding for
    large conv/dense weights and their attached channel vectors."""
    tp = mesh.shape[MODEL_AXIS]
    rules: Dict[str, NamedSharding] = {}
    repl = NamedSharding(mesh, PartitionSpec())
    col = NamedSharding(mesh, PartitionSpec(None, MODEL_AXIS))
    row = NamedSharding(mesh, PartitionSpec(MODEL_AXIS, None))
    producers = graph.producers()

    # map param edge -> (node, role) for conv/dense weights & biases
    from ..graph.ir import topological_order

    for node in topological_order(graph):
        if node.op in ("mha_decode", "mha_verify", "mha_prefill",
                       "multi_head_attention"):
            # Megatron attention TP: wq/wk/wv column-sharded (each device
            # owns H/tp query heads and Hkv/tp KV heads), wo ROW-sharded
            # so the output projection psums instead of all-gathering —
            # ONE all-reduce per attention block, the textbook layout
            # (scaling-book recipe; no reference analog, SURVEY §2.10)
            H = int(node.attr("num_heads", 0) or 0)
            Hkv = int(node.attr("num_kv_heads", H) or H)
            if tp > 1 and H and H % tp == 0 and Hkv % tp == 0:
                for idx in (1, 2, 3):
                    w = graph.params.get(node.inputs[idx])
                    if w is not None and w.ndim == 2 \
                            and _divisible(w.shape[1], tp):
                        rules[node.inputs[idx]] = col
                wo = graph.params.get(node.inputs[4])
                if wo is not None and wo.ndim == 2 \
                        and _divisible(wo.shape[0], tp):
                    rules[node.inputs[4]] = row
            continue
        if node.op == "embedding":
            # vocab table [V, E]: shard the EMBEDDING dim.  This is the
            # ~bf16·V·E replicated-HBM floor the round-3 llm_decode_tp
            # artifact measured (~122 MB/device at 32k vocab) — the gather
            # output comes back E-sharded and the next layer_norm's
            # all-gather moves only [B, T, E] activation bytes (tiny at
            # decode), so sharding the table is pure HBM savings.
            t_edge = node.inputs[1]
            t = graph.params.get(t_edge)
            if (tp > 1 and t is not None and t.ndim == 2
                    and t.shape[1] >= min_channels
                    and _divisible(t.shape[1], tp)):
                rules[t_edge] = col
            continue
        if node.op == "dense_w4":
            # w4 packed weights [K/2, N] + 2-D group scales [K/G, N]:
            # column-shard N (scales follow via _shard_channel_vectors);
            # Megatron row pairing shards packed rows — legal only when
            # tp divides the GROUP COUNT K/G, so every shard holds whole
            # scale groups (the nibble pairing r <-> r+G/2 lives inside
            # one group and never crosses a shard).
            w_edge, s_edge = node.inputs[1], node.inputs[2]
            w = graph.params.get(w_edge)
            s = graph.params.get(s_edge)
            if tp <= 1 or w is None or s is None:
                continue
            if (_divisible(s.shape[0], tp)
                    and _col_sharded_upstream(graph, producers, rules,
                                              node.inputs[0], col)):
                rules[w_edge] = row
                rules[s_edge] = row
                continue  # bias stays replicated (added after the psum)
            if w.shape[1] >= min_channels and _divisible(w.shape[1], tp):
                rules[w_edge] = col
                _shard_channel_vectors(graph, node, mesh, rules,
                                       w.shape[1], tp)
            continue
        if node.op in ("dense", "dense_int8", "dense_w8"):
            # Megatron MLP pairing: a dense consuming a COLUMN-sharded
            # dense's output is the down-projection — shard its IN dim
            # (row) so the pair costs one psum, not an all-gather between.
            # `_col_sharded_upstream` also sees through the SwiGLU gate
            # (eltwise-mul of two column-sharded denses, llama-class MLP)
            w_edge = node.inputs[1]
            w = graph.params.get(w_edge)
            if (tp > 1 and w is not None and w.ndim == 2
                    and _divisible(w.shape[0], tp)
                    and _col_sharded_upstream(graph, producers, rules,
                                              node.inputs[0], col)):
                rules[w_edge] = row
                continue  # bias stays replicated (added after the psum)
        if node.op in ("conv2d", "conv2d_int8", "conv2d_w8"):
            w_edge = node.inputs[1]
            w = graph.params.get(w_edge)
            if w is None:
                continue
            O = w.shape[3]
            groups = int(node.attr("groups", 1))
            if tp > 1 and groups == 1 and O >= min_channels and _divisible(O, tp):
                rules[w_edge] = NamedSharding(
                    mesh, PartitionSpec(None, None, None, MODEL_AXIS))
                _shard_channel_vectors(graph, node, mesh, rules, O, tp)
        elif node.op in ("dense", "dense_int8", "dense_w8"):
            w_edge = node.inputs[1]
            w = graph.params.get(w_edge)
            if w is None:
                continue
            out = w.shape[1]
            if tp > 1 and out >= min_channels and _divisible(out, tp):
                rules[w_edge] = NamedSharding(mesh, PartitionSpec(None, MODEL_AXIS))
                _shard_channel_vectors(graph, node, mesh, rules, out, tp)
    for e in graph.params:
        rules.setdefault(e, repl)
    return rules


def _shard_channel_vectors(graph, node, mesh, rules, O, tp):
    """Bias / w_scale arrays of a sharded matmul follow the out channels:
    1-D [O] vectors shard fully; 2-D [*, O] group-scale matrices (w4)
    shard their last axis."""
    for e in node.inputs[2:]:
        v = graph.params.get(e)
        if v is None:
            continue
        if v.ndim == 1 and v.shape[0] == O:
            rules[e] = NamedSharding(mesh, PartitionSpec(MODEL_AXIS))
        elif v.ndim == 2 and v.shape[1] == O:
            rules[e] = NamedSharding(mesh, PartitionSpec(None, MODEL_AXIS))


def input_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Activations: batch over the batch axes ((dcn, data) on a hybrid
    mesh, (data,) on a flat one), replicated elsewhere."""
    return NamedSharding(
        mesh, PartitionSpec(batch_axes(mesh), *([None] * (ndim - 1))))


def output_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    return NamedSharding(
        mesh, PartitionSpec(batch_axes(mesh), *([None] * (ndim - 1))))
