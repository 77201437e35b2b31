#!/usr/bin/env python3
"""Mechanical screen over committed plan dumps (plans/r*/<q>_*.txt).

Hunts the optimization-guide defect classes across every dumped plan:
  - §4.4 duplicated kernel evaluation: a `UDF(...)` kernel referenced from
    a Filter (incl. pushed `isnotnull(UDF...)`) in the FINAL plan outside
    an InMemoryRelation/InMemoryTableScan subtree (cached-frame child
    plans are printed inline per cache reference and are NOT live
    duplicate evaluations — the r20 false-positive class);
  - pushdown: scans whose PushedFilters is empty (informational — many
    scans legitimately have no predicate);
  - join shapes: CartesianProduct / BroadcastNestedLoopJoin sightings
    (PlanSpec holds the bounded-side whitelist), SortMergeJoin counts;
  - Exchange count per query (informational ranking).

Output: one line per flag + a per-file summary table. Exit 0 always —
this is a screen for a human pass, not a gate.
"""
import re
import sys
from pathlib import Path


def final_plan_section(text: str) -> str:
    # PlanDump writes "===== <q> (<suffix>) — final adaptive plan after execution ====="
    parts = re.split(r"=====.*final adaptive plan.*=====", text)
    return parts[1] if len(parts) > 1 else text


def indent(line: str) -> int:
    return len(line) - len(line.lstrip(" +-:*("))


def scan(path: Path):
    text = path.read_text(errors="replace")
    fin = final_plan_section(text)
    lines = fin.splitlines()
    flags = []

    # Track InMemoryRelation subtrees by indentation: deeper-indented lines
    # following an InMemoryRelation header belong to the cached child plan.
    imr_stack = []  # indents of active InMemoryRelation headers
    udf_filter_lines = 0
    udf_filter_live = 0
    for ln in lines:
        ind = indent(ln)
        while imr_stack and ind <= imr_stack[-1]:
            imr_stack.pop()
        inside_imr = bool(imr_stack)
        if "InMemoryRelation" in ln or "InMemoryTableScan" in ln:
            imr_stack.append(ind)
        if "UDF(" in ln and ("Filter" in ln or "isnotnull(UDF" in ln):
            udf_filter_lines += 1
            if not inside_imr:
                udf_filter_live += 1
                flags.append(f"  LIVE-UDF-IN-FILTER: {ln.strip()[:140]}")

    pushed_empty = len(re.findall(r"PushedFilters: \[\]", text))
    cart = len(re.findall(r"CartesianProduct", fin))
    bnlj = len(re.findall(r"BroadcastNestedLoopJoin", fin))
    smj = len(re.findall(r"SortMergeJoin", fin))
    exch = len(re.findall(r"Exchange", fin))
    return {
        "file": path.name,
        "udf_filter_live": udf_filter_live,
        "udf_filter_total": udf_filter_lines,
        "pushed_empty": pushed_empty,
        "cartesian": cart,
        "bnlj": bnlj,
        "smj": smj,
        "exchanges": exch,
        "flags": flags,
    }


def main() -> None:
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "plans/r21")
    rows = [scan(p) for p in sorted(root.glob("*_audit.txt"))
            + sorted(root.glob("*_after.txt"))]
    flagged = [r for r in rows if r["flags"] or r["cartesian"] or r["bnlj"]]
    print(f"scanned {len(rows)} plan dumps under {root}")
    for r in rows:
        print(f"{r['file']:48s} exch={r['exchanges']:2d} smj={r['smj']} "
              f"bnlj={r['bnlj']} cart={r['cartesian']} "
              f"udfFilter(live/total)={r['udf_filter_live']}/{r['udf_filter_total']} "
              f"pushedEmpty={r['pushed_empty']}")
    print()
    if not flagged:
        print("NO FLAGS: no live UDF-in-filter duplication, no cartesian joins")
    for r in flagged:
        print(f"== {r['file']} ==")
        for f in r["flags"]:
            print(f)
        if r["cartesian"]:
            print(f"  CARTESIAN x{r['cartesian']}")
        if r["bnlj"]:
            print(f"  BNLJ x{r['bnlj']} (check PlanSpec whitelist)")


if __name__ == "__main__":
    main()
