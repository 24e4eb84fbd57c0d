#!/usr/bin/env python3
"""Decade-scaling table from two Bench JSON lines (e.g. sf1 vs sf10):
per-query ratio, flagged super-linear rows, refused/error rows.

Usage: tools/bench_table.py <bench_sfA.json> <bench_sfB.json> [ratio_bar]
Prints a markdown table of the worst ratios plus summary counts."""
import json, sys

def load(p):
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"no JSON line in {p}")

a, b = load(sys.argv[1]), load(sys.argv[2])
bar = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
qa, qb = a["queries"], b["queries"]
ra, rb = a.get("refused", {}), b.get("refused", {})
ea, eb = a.get("errors", {}), b.get("errors", {})
common = [k for k in qb if k in qa and k not in ra and k not in rb
          and k not in ea and k not in eb]
rows = sorted(((qb[k] / max(qa[k], 1e-9), qa[k], qb[k], k) for k in common),
              reverse=True)
print(f"A: {sys.argv[1]} total={a['value']:.1f}s ok={a['ok']}/{a['n']} "
      f"refused={len(ra)} errors={len(ea)}")
print(f"B: {sys.argv[2]} total={b['value']:.1f}s ok={b['ok']}/{b['n']} "
      f"refused={len(rb)} errors={len(eb)}")
print(f"\nrefused in B: {sorted(rb)}")
print(f"errors in B: {sorted(eb)}")
sup = [r for r in rows if r[0] > bar]
print(f"\n{len(sup)} rows super-linear past {bar}x (of {len(common)}):")
print("| query | A s | B s | ratio |")
print("|---|---|---|---|")
for ratio, ta, tb, k in rows[:25]:
    mark = " ⚠" if ratio > bar else ""
    print(f"| {k}{mark} | {ta:.2f} | {tb:.2f} | {ratio:.2f}x |")
med = sorted(r[0] for r in rows)[len(rows) // 2] if rows else 0
print(f"\nmedian ratio: {med:.2f}x; "
      f"sum A={sum(r[1] for r in rows):.1f}s B={sum(r[2] for r in rows):.1f}s")
