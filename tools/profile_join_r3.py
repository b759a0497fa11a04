"""Join the in-context xplane profile against the optimized HLO.

Completes the VERDICT round-2 task-1 instrument: for every XLA fusion the
device actually ran (tools/profile_r3.py trace+parse), resolve its fused
computation in the dumped HLO (tools/profile_r3.py hlo), extract the
convolutions inside (recursing through nested kOutput fusions), and
compare measured ms/iter against the analytic per-fusion roofline
t = max(bytes / 819 GB/s, macs / 197e12 macs/s) — the same model as
tools/roofline_r2.py, now applied to the REAL program decomposition
instead of isolated re-timings.

Usage:
  python tools/profile_join_r3.py --profile artifacts/profile_r03_raw.json \
      --hlo /tmp/anakin_hlo_r3.txt --iters 12 --out artifacts/profile_r03.json

Reference analog: ENABLE_OP_TIMER inside the running net
(`/root/reference/framework/core/net/net.cpp:418-505`), upgraded to the
compiler's own fusion granularity.
"""

import argparse
import json
import re

HBM_GBS = 819e9
MACS_S = 197e12  # int8: 394 TOP/s peak = 197e12 mul+add pairs/s

_ELEM_BYTES = {"s8": 1, "u8": 1, "pred": 1, "bf16": 2, "f16": 2, "s16": 2,
               "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8}

_TYPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(ty: str) -> int:
    m = _TYPE_RE.match(ty)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _ELEM_BYTES.get(dt, 4)


def _shape_dims(ty: str):
    m = _TYPE_RE.match(ty)
    return [int(d) for d in m.group(2).split(",") if d] if m else []


class Hlo:
    """Minimal structural parse: computations -> {instr name -> line}."""

    def __init__(self, text: str):
        self.computations = {}
        cur = None
        for line in text.splitlines():
            stripped = line.strip()
            m = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)\s*\([^)]*\)\s*->.*{",
                         line)
            if not line.startswith(" ") and m:
                cur = m.group(1)
                self.computations[cur] = {}
                continue
            if stripped == "}":
                cur = None
                continue
            if cur is None:
                continue
            im = re.match(r"%([\w.\-]+) = (.*)", stripped)
            if im:
                self.computations[cur][im.group(1)] = im.group(2)

        # ENTRY computation: the one containing the top-level fusions
        self.entry = max(self.computations.items(),
                         key=lambda kv: len(kv[1]))[0]

    def instr(self, comp, name):
        return self.computations.get(comp, {}).get(name)

    def find_instr(self, name):
        """Entry-computation lookup only: profile device ops are entry
        instructions; same-named locals in fused computations are not."""
        body = self.computations[self.entry].get(name)
        if body is not None:
            return self.entry, body
        return None, None

    def convs_in(self, comp, _depth=0):
        """All convolutions reachable from computation `comp`, recursing
        through nested fusions: [(out_ty, lhs_ty, rhs_ty)]."""
        out = []
        if _depth > 4 or comp not in self.computations:
            return out
        instrs = self.computations[comp]
        types = {}  # local name -> result type
        for nm, body in instrs.items():
            tm = re.match(r"(\w+\[[\d,]*\])", body)
            if tm:
                types[nm] = tm.group(1)
        # parameter types from any caller are unavailable here; conv
        # operand types resolve from local defs (params carry their type
        # in the signature — re-scan raw text lazily if needed)
        for nm, body in instrs.items():
            if " convolution(" in body or body.startswith("convolution("):
                tm = re.match(r"(\w+\[[\d,]*\])", body)
                ops = re.search(r"convolution\(%([\w.\-]+), %([\w.\-]+)\)",
                                body)
                if tm and ops:
                    lhs = types.get(ops.group(1), "")
                    rhs = types.get(ops.group(2), "")
                    out.append((tm.group(1), lhs, rhs))
            cm = re.search(r"calls=%([\w.\-]+)", body)
            if cm and ("fusion(" in body):
                out.extend(self.convs_in(cm.group(1), _depth + 1))
        return out


def _param_types(sig_line):
    return re.findall(r"[\w.\-]+: (\w+\[[\d,]*\])", sig_line)


def conv_macs(out_ty, rhs_ty):
    """out [B,H,W,O] x weight [kh,kw,I,O] -> MAC count (HWIO/NHWC).
    Plausibility-gated so a wrongly-matched activation tensor can never
    masquerade as a weight (kh/kw <= 11, channels <= 4096)."""
    o = _shape_dims(out_ty)
    w = _shape_dims(rhs_ty)
    if len(o) != 4 or len(w) != 4:
        return 0
    B, H, W, O = o
    kh, kw, I, O2 = w
    if O2 != O or kh > 11 or kw > 11 or I > 4096:
        return 0
    return B * H * W * O * kh * kw * I


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="artifacts/profile_r03_raw.json")
    ap.add_argument("--hlo", default="/tmp/anakin_hlo_r3.txt")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--out", default="artifacts/profile_r03.json")
    args = ap.parse_args()

    prof = json.load(open(args.profile))
    hlo = Hlo(open(args.hlo).read())

    # signature param types per computation (for conv operands that are
    # bare parameters)
    raw = open(args.hlo).read()
    sig_types = {}
    for m in re.finditer(r"^%?([\w.\-]+)\s*(\([^)]*\))\s*->", raw,
                         re.MULTILINE):
        sig_types[m.group(1)] = _param_types(m.group(2))

    rows = []
    totals = {"measured_ms": 0.0, "roofline_ms": 0.0, "conv_macs": 0}
    module_ms = None
    for r in prof["rows"]:
        if r["line"] == "XLA Modules":
            module_ms = r["total_ms"] / args.iters
        if r["line"] != "XLA Ops":
            continue
        name = r["op"]
        ms = r["total_ms"] / args.iters
        comp, body = hlo.find_instr(name)
        entry = {"fusion": name, "ms": round(ms, 4)}
        if body:
            tm = re.match(r"(\w+\[[\d,]*\])", body)
            out_bytes = _shape_bytes(tm.group(1)) if tm else 0
            cm = re.search(r"calls=%([\w.\-]+)", body)
            convs = hlo.convs_in(cm.group(1)) if cm else []
            # fusion operand bytes from the called computation's signature
            in_bytes = sum(_shape_bytes(t)
                           for t in sig_types.get(cm.group(1), [])) \
                if cm else 0
            macs = 0
            conv_list = []
            for out_ty, lhs_ty, rhs_ty in convs:
                # conv operands may be computation params: fall back to
                # matching by position in the signature when local lookup
                # failed (empty lhs/rhs)
                mc = conv_macs(out_ty, rhs_ty)
                if mc == 0 and cm:
                    for t in sig_types.get(cm.group(1), []):
                        mc = conv_macs(out_ty, t)
                        if mc:
                            rhs_ty = t
                            break
                macs += mc
                conv_list.append({"out": out_ty, "w": rhs_ty, "macs": mc})
            bytes_total = in_bytes + out_bytes
            roof = max(bytes_total / HBM_GBS, macs / MACS_S) * 1e3
            entry.update({
                "convs": conv_list, "macs": macs,
                "bytes": bytes_total,
                "roofline_ms": round(roof, 4),
                "ratio": round(ms / roof, 2) if roof > 0 else None,
            })
            totals["roofline_ms"] += roof
            totals["conv_macs"] += macs
        totals["measured_ms"] += ms
        rows.append(entry)

    rows.sort(key=lambda e: -e["ms"])
    out = {
        "iters": args.iters,
        "module_ms_per_iter": round(module_ms, 4) if module_ms else None,
        "sum_xla_ops_ms": round(totals["measured_ms"], 4),
        "sum_roofline_ms": round(totals["roofline_ms"], 4),
        "sum_conv_gmacs": round(totals["conv_macs"] / 1e9, 2),
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "rows"},
                     indent=1))
    print(f"wrote {args.out} ({len(rows)} fusion rows)")
    # console: top 20 residuals
    print(f"{'fusion':38s} {'ms':>8s} {'roof':>8s} {'ratio':>6s}  shapes")
    for e in rows[:20]:
        shapes = ",".join(c["out"].split("]")[0] + "]"
                          for c in e.get("convs", [])[:2])
        print(f"{e['fusion'][:38]:38s} {e['ms']:8.4f} "
              f"{e.get('roofline_ms', 0):8.4f} "
              f"{str(e.get('ratio', '')):>6s}  {shapes}")


if __name__ == "__main__":
    main()
