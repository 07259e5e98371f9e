"""Dump the latest cascade trace's per-op device times to JSON for analysis.

Reads the most recent trace under /tmp/prpe_cascade_trace (written by
tools/profile_cascade.py) and emits every HLO op with its aggregate device
time, category, shape (long_name), and source stack. Use to chase tail ops
that the top-12 summary in profile_cascade.py truncates.
"""

import collections
import glob
import gzip
import json
import sys

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prpe_cascade_trace"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 5

fs = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz"))
with gzip.open(fs[-1]) as f:
    t = json.load(f)

ops = {}
for e in t["traceEvents"]:
    if e.get("ph") != "X" or "dur" not in e:
        continue
    a = e.get("args", {})
    if "hlo_category" not in a:
        continue
    name = e["name"]
    rec = ops.setdefault(name, {
        "name": name, "us": 0.0, "count": 0,
        "category": a["hlo_category"],
        "long_name": a.get("long_name", ""),
        "source": a.get("source", ""),
    })
    rec["us"] += e["dur"] / ITERS
    rec["count"] += 1

rows = sorted(ops.values(), key=lambda r: -r["us"])
total = sum(r["us"] for r in rows)
print(f"total {total/1000:.2f} ms, {len(rows)} distinct ops")
for r in rows[:60]:
    print(f"{r['us']/1000:8.3f} ms x{r['count']:3d} {r['category'][:18]:18s} "
          f"{r['name'][:30]:30s} {r['long_name'][:140]}")
