"""Scaling-efficiency harness: analytic roofline over the COMPILED program.

The reference is single-device, so the >=85% weak-scaling target
(BASELINE.json north star) has no counterpart to port; this harness is the
evidence path.  It does not trust a hand-waved model of what collectives
"should" appear: it lowers the sharded program on a (virtual) mesh, parses
the ACTUAL collective ops XLA/GSPMD inserted out of the optimized HLO, and
combines their wire bytes with the program's per-device FLOPs/HBM traffic
under a published-hardware model (v5e by default):

  t_compute = flops / peak_flops        (per device)
  t_hbm     = bytes_accessed / hbm_bw
  t_comm    = sum(wire_bytes per collective) / ici_bw
  step time in [max(t_work, t_comm), t_work + t_comm],  t_work = max(t_compute, t_hbm)

`weak_scaling_report` holds per-device batch constant while growing the
mesh and reports efficiency_N = t_step(1) / t_step(N) at both overlap
bounds — XLA's latency-hiding scheduler lands between them, at the `max`
end when collectives are ring-pipelined against MXU work (the
collective-matmul regime `parallel/overlap.py` enables).

Wire-byte formulas (ring algorithms over an axis of size N):
  all-reduce:          2 * (N-1)/N * result_bytes
  all-gather:              (N-1)/N * result_bytes     (result = gathered)
  reduce-scatter:          (N-1)   * result_bytes     (result = shard)
  all-to-all:              (N-1)/N * result_bytes
  collective-permute:                result_bytes
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

import jax

__all__ = ["HW_V5E", "collective_stats", "analyze_compiled",
           "weak_scaling_report"]

# Public TPU v5e specs (cloud.google.com/tpu/docs/v5e): 197 bf16 TFLOP/s,
# 394 int8 TOP/s, 819 GB/s HBM BW, ICI 4 links x ~45 GB/s one-way.
HW_V5E = {
    "name": "tpu_v5e",
    "peak_flops_bf16": 197e12,
    "peak_ops_int8": 394e12,
    "hbm_bw": 819e9,
    "ici_bw": 4 * 45e9,      # aggregate one-way ICI bytes/s per chip
    "dcn_bw": 6.25e9,        # ~50 Gbps per host NIC share
}

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_COLL_RE = re.compile(
    r"=\s*(?:\(([^)]*)\)|(\w+)\[([0-9,]*)\][^ ]*)\s+"
    r"(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)"
    r"(?:-start)?\(")
_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")
_GROUPS_RE = re.compile(r"replica_groups=\{([^}]*)\}")
_GROUPS_V2_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def collective_stats(hlo_text: str) -> List[Dict[str, Any]]:
    """Parse collective ops (kind, result bytes, group size) out of
    optimized HLO text.  Handles tuple-shaped results and both
    replica_groups syntaxes."""
    out = []
    for line in hlo_text.splitlines():
        m = _COLL_RE.search(line)
        if not m:
            continue
        if m.group(1) is not None:          # tuple result: sum elements
            rbytes = sum(_shape_bytes(dt, dims)
                         for dt, dims in _SHAPE_RE.findall(m.group(1)))
        else:
            rbytes = _shape_bytes(m.group(2), m.group(3))
        kind = m.group(4)
        gsize = 1
        g2 = _GROUPS_V2_RE.search(line)
        if g2:
            gsize = int(g2.group(2))
        else:
            g = _GROUPS_RE.search(line)
            if g:
                first = g.group(1).split("}")[0].strip("{} ")
                gsize = len([t for t in first.split(",") if t.strip() != ""])
        if kind == "collective-permute":
            wire = rbytes
        elif kind == "all-reduce":
            wire = 2 * rbytes * (gsize - 1) / max(gsize, 1)
        elif kind == "all-gather":
            wire = rbytes * (gsize - 1) / max(gsize, 1)
        elif kind == "reduce-scatter":
            wire = rbytes * (gsize - 1)
        else:                               # all-to-all
            wire = rbytes * (gsize - 1) / max(gsize, 1)
        out.append({"kind": kind, "result_bytes": rbytes,
                    "group_size": gsize, "wire_bytes": wire})
    return out


def analyze_compiled(compiled, hw: Dict[str, Any] = HW_V5E,
                     dcn_axis_size: int = 1) -> Dict[str, Any]:
    """Roofline analysis of one compiled (per-device) XLA program."""
    cost = compiled.cost_analysis()
    if isinstance(cost, list):              # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    hbm = float(cost.get("bytes accessed", 0.0))
    colls = collective_stats(compiled.as_text())
    wire = sum(c["wire_bytes"] for c in colls)
    t_compute = flops / hw["peak_flops_bf16"]
    t_hbm = hbm / hw["hbm_bw"]
    t_comm = wire / hw["ici_bw"]
    t_work = max(t_compute, t_hbm)
    return {
        "flops_per_device": flops,
        "hbm_bytes_per_device": hbm,
        "collectives": colls,
        "n_collectives": len(colls),
        "wire_bytes_per_device": wire,
        "t_compute_s": t_compute,
        "t_hbm_s": t_hbm,
        "t_comm_s": t_comm,
        "t_step_full_overlap_s": max(t_work, t_comm),
        "t_step_no_overlap_s": t_work + t_comm,
    }


def weak_scaling_report(
    build_compiled: Callable[[int], Any],
    ns: Sequence[int] = (1, 2, 4, 8),
    hw: Dict[str, Any] = HW_V5E,
    out_path: Optional[str] = None,
) -> Dict[str, Any]:
    """Weak-scaling report: `build_compiled(n)` must return the COMPILED
    sharded step for an n-device mesh with per-device work held constant.
    Efficiency_n = t_step(1) / t_step(n) per overlap bound."""
    rows = []
    base = None
    for n in ns:
        a = analyze_compiled(build_compiled(n), hw)
        a["n_devices"] = n
        if base is None:
            base = a
        for bound in ("full_overlap", "no_overlap"):
            t0 = base[f"t_step_{bound}_s"]
            tn = a[f"t_step_{bound}_s"]
            a[f"efficiency_{bound}"] = (t0 / tn) if tn > 0 else 1.0
        # keep the artifact light — drop per-collective detail rows
        a["collective_kinds"] = sorted({c["kind"] for c in a.pop("collectives")})
        rows.append(a)
    report = {"hw": hw["name"], "rows": rows,
              "efficiency_at_max_full_overlap": rows[-1]["efficiency_full_overlap"],
              "efficiency_at_max_no_overlap": rows[-1]["efficiency_no_overlap"]}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    return report
