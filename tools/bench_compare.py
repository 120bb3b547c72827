#!/usr/bin/env python3
"""Compare two graft.Bench JSON records key-by-key.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [top_n]
           [<old_cpuprobe.json> <new_cpuprobe.json>]

Prints the per-key ratio median/mean over common keys and the top movers
both directions — the judge's comparator math (VERDICT r15 nit #1: a
round record is only usable if its unchanged-key median sits within ~5%
of the previous quiet-box record). With the two optional CPUPROBE records
(tools/cpu_probe.sh output committed next to each bench record) it also
prints the PROBE-NORMALIZED median (VERDICT r16 #3): the raw median
divided by the host-speed ratio, so a bench delta that tracks the probe
delta reads as ~1.0 and is attributable to the host, not the code.
"""
import json, sys, statistics

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
probes = None
if len(sys.argv) > 5:
    probes = (json.load(open(sys.argv[4])), json.load(open(sys.argv[5])))
oq, nq = old["queries"], new["queries"]
common = sorted(k for k in oq if k in nq
                and isinstance(oq[k], (int, float)) and isinstance(nq[k], (int, float))
                and oq[k] and nq[k])
ratios = {k: nq[k] / oq[k] for k in common}
vals = sorted(ratios.values())
print(f"common keys: {len(common)}  old-only: {len(set(oq)-set(nq))}  "
      f"new-only: {len(set(nq)-set(oq))}")
median = statistics.median(vals)
print(f"median ratio: {median:.3f}   "
      f"mean: {statistics.fmean(vals):.3f}   "
      f"p90: {vals[int(0.9*(len(vals)-1))]:.3f}")
if probes:
    op, np_ = probes
    for field, label in (("single_thread_sec", "1t"), ("mt32_max_sec", "32t")):
        if op.get(field) and np_.get(field):
            host = np_[field] / op[field]
            print(f"probe-normalized median ({label} host ratio "
                  f"{host:.3f}): {median / host:.3f}")
    opv, npv = op.get("python_version"), np_.get("python_version")
    if opv and npv and opv != npv:
        print(f"WARNING: probe interpreters differ ({opv} vs {npv}) — "
              f"the probe delta may be the interpreter, not the hardware")
# a record missing 'value'/'failed' (e.g. a crashed run's partial JSON)
# must yield a partial comparison, not a TypeError (ADVICE r16)
ov, nv = old.get("value"), new.get("value")
if isinstance(ov, (int, float)) and isinstance(nv, (int, float)) and ov:
    print(f"totals: old={ov:.1f}s new={nv:.1f}s ({nv/ov:.3f}x)   "
          f"failed: old={old.get('failed', 'n/a')} new={new.get('failed', 'n/a')}")
else:
    print(f"totals: old={ov if ov is not None else 'n/a'} "
          f"new={nv if nv is not None else 'n/a'}   "
          f"failed: old={old.get('failed', 'n/a')} new={new.get('failed', 'n/a')}")
movers = sorted(ratios.items(), key=lambda kv: kv[1])
print("\nfastest movers (new/old):")
for k, r in movers[:top_n]:
    print(f"  {r:5.2f}x  {k}  ({oq[k]:.2f}s -> {nq[k]:.2f}s)")
print("slowest movers (new/old):")
for k, r in movers[-top_n:]:
    print(f"  {r:5.2f}x  {k}  ({oq[k]:.2f}s -> {nq[k]:.2f}s)")
