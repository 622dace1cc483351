#!/usr/bin/env python3
"""Per-query and per-family scaling exponents for the sf0.1 -> sf1
decade step.

Usage: python3 tools/sf1_alpha.py <bench_sf01.json> <bench_sf1.json>

alpha = log10(t_sf1 / t_sf01): 1.0 = linear, 0 = flat, >1 super-linear.
Queries are grouped by family prefix (a/c/d/g/j/m/p/q/s/t/u/v/w/x).
Sub-second sf0.1 queries are noisy denominators; the report marks rows
whose sf0.1 time is under 0.3 s and excludes them from family medians.
"""
import json, sys, math
from collections import defaultdict

b0 = json.load(open(sys.argv[1]))["queries"]
b1 = json.load(open(sys.argv[2]))["queries"]

rows = []
for q in sorted(set(b0) & set(b1)):
    t0, t1 = b0[q], b1[q]
    if t0 <= 0 or t1 <= 0:
        rows.append((q, t0, t1, None, "FAILED"))
        continue
    a = math.log10(t1 / t0)
    rows.append((q, t0, t1, a, "noisy" if t0 < 0.3 else ""))

fam = defaultdict(list)
for q, t0, t1, a, flag in rows:
    if a is not None and flag != "noisy":
        fam[q.split("_")[0][0]].append(a)

print(f"{'query':34s} {'sf0.1_s':>8s} {'sf1_s':>8s} {'alpha':>6s}")
for q, t0, t1, a, flag in sorted(
        rows, key=lambda r: -(r[3] if r[3] is not None else -9)):
    print(f"{q:34s} {t0:8.2f} {t1:8.2f} "
          f"{a if a is not None else float('nan'):6.2f} {flag}")

print("\nfamily medians (alpha, excluding sub-0.3s sf0.1 rows):")
for f in sorted(fam):
    xs = sorted(fam[f])
    med = xs[len(xs)//2]
    print(f"  {f}: median={med:5.2f}  n={len(xs)}  max={max(xs):5.2f}")

sup = [(q, a) for q, t0, t1, a, fl in rows
       if a is not None and a > 1.15 and fl != "noisy"]
print(f"\nsuper-linear (alpha > 1.15, non-noisy): {len(sup)}")
for q, a in sorted(sup, key=lambda x: -x[1]):
    print(f"  {q}: {a:.2f}")

miss0 = sorted(set(b1) - set(b0)); miss1 = sorted(set(b0) - set(b1))
if miss0: print(f"\nonly in sf1 run: {miss0}")
if miss1: print(f"only in sf0.1 run: {miss1}")
