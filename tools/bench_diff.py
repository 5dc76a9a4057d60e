#!/usr/bin/env python3
"""Diff two Bench JSON lines (target/bench.json files): per-query delta,
sorted by absolute improvement, with totals. Usage:
    bench_diff.py BEFORE.json AFTER.json [min_abs_delta]
Accepts either the raw one-line bench JSON or the driver artifact
wrapper ({"parsed": {...}})."""
import json, sys

def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d

a = load(sys.argv[1])
b = load(sys.argv[2])
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
qa, qb = a["queries"], b["queries"]
rows = []
for k in sorted(qa.keys() | qb.keys(), key=lambda x: int(x) if x.isdigit() else 0):
    va, vb = qa.get(k), qb.get(k)
    if va is None or vb is None:
        rows.append((k, va, vb, None))
    else:
        rows.append((k, va, vb, vb - va))
print(f"total: {a['value']} -> {b['value']}  (vsb {a.get('vsb')} -> {b.get('vsb')})")
moved = [r for r in rows if r[3] is not None and abs(r[3]) >= thr]
for k, va, vb, d in sorted(moved, key=lambda r: r[3]):
    print(f"  q{k:>4}: {va:6.1f} -> {vb:6.1f}  ({d:+.1f})")
imp = sum(d for *_, d in moved if d and d < 0)
reg = sum(d for *_, d in moved if d and d > 0)
print(f"moved >= {thr}s: improved {imp:.1f}s, regressed +{reg:.1f}s")
