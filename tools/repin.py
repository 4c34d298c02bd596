#!/usr/bin/env python3
"""Refresh bench_pins.json from N bench rep logs (quiet-window protocol,
round 12): per-query pin = median of the reps' recorded warm values.
Parses the per-query `[bench] <name> cold=X warm=Y` stderr lines (the
printed JSON line is budget-truncated to the slowest queries; the full
map only survives in bench.json for the LAST rep).
Usage: repin.py rep1.log rep2.log [rep3.log ...]
"""
import json, re, sys, statistics

PAT = re.compile(r"\[bench\] (\S+)\s+cold=([0-9.]+) warm=([0-9.]+)")

def load(path):
    out = {}
    for line in open(path):
        m = PAT.search(line)
        if m:
            out[m.group(1)] = float(m.group(3))
    if not out:
        raise SystemExit(f"no [bench] lines in {path}")
    return out

reps = [load(p) for p in sys.argv[1:]]
names = sorted(set().union(*[set(r) for r in reps]))
pins = {}
partial = []
for n in names:
    vals = [r[n] for r in reps if n in r]
    if len(vals) < len(reps):
        # a query missing from some rep logs (truncated run, newly added
        # query) is pinned from fewer samples than the N-rep protocol
        # claims — surface it instead of silently pinning from one value
        partial.append((n, len(vals)))
    pins[n] = round(statistics.median(vals), 3)
for n, k in partial:
    print(f"WARNING: {n} pinned from {k}/{len(reps)} reps", file=sys.stderr)
if partial and len(reps) > 1:
    print(f"WARNING: {len(partial)} pin(s) below the {len(reps)}-rep "
          "protocol — re-run the missing reps or annotate the pin",
          file=sys.stderr)
out = {
    "comment": ("per-query warm pins from quiet-window medians of "
                f"{len(reps)} same-build local runs (round 13); Bench "
                "escalates to median-of-3 when warm1 > 2x a pin, "
                "median-of-5 when still > 3x"),
    "queries": pins,
}
with open("bench_pins.json", "w") as f:
    json.dump(out, f, indent=0, sort_keys=False)
    f.write("\n")
print(f"wrote {len(pins)} pins; total={sum(pins.values()):.1f}s")
