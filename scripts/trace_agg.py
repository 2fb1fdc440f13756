"""Aggregate device-track op times from a jax.profiler perfetto trace.

Shared by scripts/profile_vrcnet.py and scripts/profile_houv_trace.py —
prints a top-N table without needing TensorBoard."""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os


def aggregate_trace(trace_dir: str, top: int = 40) -> None:
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace json found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    per_op = collections.Counter()
    long_names = {}
    n_dev_events = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if not any(k in pname for k in ("TPU", "Device", "device", "/device")):
            continue
        n_dev_events += 1
        name = e.get("name", "?")
        per_op[name] += e.get("dur", 0)
        if name not in long_names:
            long_names[name] = e.get("args", {}).get("long_name", "")[:160]
    if not n_dev_events:
        print(f"trace {path}: no device events; process names: "
              f"{sorted(set(pid_names.values()))[:10]}")
        return
    total = sum(per_op.values())
    print(f"trace {path}: {n_dev_events} device events, "
          f"{total / 1e3:.1f} ms total device time")
    for name, dur in per_op.most_common(top):
        print(f"{dur / 1e3:9.2f} ms  {100.0 * dur / total:5.1f}%  {name[:60]}")
        ln = long_names.get(name)
        if ln and not name.startswith("jit_"):
            print(f"{'':18s}{ln}")
