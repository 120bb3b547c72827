#!/usr/bin/env bash
# Host-speed fingerprint committed alongside round bench records, so a
# cross-round bench delta can be attributed to code vs host (VERDICT r15
# nit #1: the r15 record drifted 1.12x on a loaded box; r16 measured the
# same drift on an idle one — the hosts differ round to round).
# Prints one JSON line: single-thread and 32-thread fixed-work loop times
# plus /proc steal counters over the run.
set -euo pipefail
N=${1:-200000000}
burn() { python3 - "$1" <<'EOF'
import sys, time
n = int(sys.argv[1]); t0 = time.perf_counter(); s = 0
for i in range(n // 20):
    s += i
print(f"{time.perf_counter() - t0:.3f}")
EOF
}
st0=$(awk '/^cpu /{print $9}' /proc/stat)
t1=$(burn "$N")
pids=(); outs=()
for i in $(seq 32); do
  o=$(mktemp); outs+=("$o")
  ( burn "$N" > "$o" ) & pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done
tm=0
for o in "${outs[@]}"; do
  v=$(cat "$o"); rm -f "$o"
  tm=$(python3 -c "print(max($tm, $v))")
done
st1=$(awk '/^cpu /{print $9}' /proc/stat)
mhz=$(awk -F: '/cpu MHz/{print $2; exit}' /proc/cpuinfo | tr -d ' ')
# the burn loop is pure Python bytecode, so the fingerprint also varies
# with the interpreter build — record it so a probe delta can be screened
# for interpreter changes before being attributed to hardware (ADVICE r16)
pyv=$(python3 -c 'import platform; print(platform.python_version())')
echo "{\"single_thread_sec\": $t1, \"mt32_max_sec\": $tm, \"steal_ticks\": $((st1-st0)), \"cpu_mhz\": \"$mhz\", \"nproc\": $(nproc), \"python_version\": \"$pyv\"}"
