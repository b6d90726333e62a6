"""Summarize a jax.profiler xplane trace into per-HLO-op time shares.

Feeds the xplane.pb captured by the trainers' --profile_dir flag (or
`U2PL_PROFILE_DIR=... python bench.py`) through xprof's `hlo_stats`
converter and prints the top ops by self-time plus a category rollup
(convolution / matmul / sort-topk / resize / elementwise / copy / other).
This is the tool behind the conv/layout findings in docs/PERF.md.

Usage:
  python tools/parse_profile.py /tmp/u2pl_trace [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import sys


def find_xplanes(root: str):
    return sorted(
        glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True)
    )


def categorize(expr: str, cat_hint: str) -> str:
    s = expr.lower()
    hint = (cat_hint or "").lower()
    if "convolution" in s or "conv" in hint:
        return "convolution"
    if "dot(" in s or s.startswith("dot") or "dot" == hint:
        return "matmul"
    if "sort" in s or "top-k" in s or "topk" in s:
        return "sort/topk"
    if "all-gather" in s or "all-reduce" in s or "collective" in s:
        return "collective"
    if "scatter" in s or "gather" in s or "dynamic-update" in s:
        return "gather/scatter"
    if "copy" in s or "transpose" in s or "bitcast" in s or "reshape" in s:
        return "copy/transpose"
    if "reduce" in s or "reduce-window" in s:
        return "reduce"
    if "fusion" in hint or "fusion" in s:
        return "fusion(elementwise)"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    paths = find_xplanes(args.trace_dir)
    if not paths:
        sys.exit(f"no *.xplane.pb under {args.trace_dir}")

    from xprof.convert import raw_to_tool_data

    data, _ctype = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "hlo_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)

    # hlo_stats ships a GViz-style table: {cols: [...], rows: [{c: [{v:..}]}]}
    cols = [c.get("label") or c.get("id") for c in obj["cols"]]
    idx = {label: i for i, label in enumerate(cols)}

    def col(row, name, default=None):
        i = idx.get(name)
        if i is None:
            return default
        cell = row["c"][i]
        return None if cell is None else cell.get("v", default)

    rows = []
    for r in obj["rows"]:
        rows.append(
            {
                "program": col(r, "Program id") or col(r, "program_id") or "",
                "category": col(r, "HLO op category", "") or "",
                "name": col(r, "HLO op name", "") or "",
                "expr": col(r, "HLO op expression", "") or "",
                "occ": col(r, "#Occurrences", 0) or 0,
                "total_us": float(col(r, "Total time (us)", 0.0) or 0.0),
                "self_us": float(col(r, "Total self time (us)", 0.0) or 0.0),
                "flop_rate": col(r, "Normalized GFLOP/s", None),
            }
        )

    total = sum(r["self_us"] for r in rows) or 1.0
    rows.sort(key=lambda r: -r["self_us"])

    print(f"# columns available: {cols}")
    print(f"# total self time: {total/1e3:.2f} ms across {len(rows)} ops\n")
    print(f"{'%':>6} {'self_ms':>9} {'occ':>5}  {'category':<22} name/expr")
    for r in rows[: args.top]:
        frac = 100 * r["self_us"] / total
        expr = r["expr"][:110] if r["expr"] else r["name"][:110]
        print(
            f"{frac:6.2f} {r['self_us']/1e3:9.3f} {r['occ']:>5}  "
            f"{r['category'][:22]:<22} {expr}"
        )

    agg = collections.Counter()
    for r in rows:
        agg[categorize(r["expr"] or r["name"], r["category"])] += r["self_us"]
    print("\n# category rollup")
    for cat, us in agg.most_common():
        print(f"{100*us/total:6.2f}%  {us/1e3:9.3f} ms  {cat}")


if __name__ == "__main__":
    main()
