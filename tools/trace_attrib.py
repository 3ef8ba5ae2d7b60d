#!/usr/bin/env python
"""Aggregate a JAX device trace into a per-op cost table.

Usage: python tools/trace_attrib.py <profile_dir_or_trace.json.gz> [N]

Parses the Chrome-format trace that `jax.profiler.start_trace` writes
(plugins/profile/<ts>/*.trace.json.gz), keeps TensorCore op events, and
aggregates wall duration by (op name stem, source line).  This is THE
attribution workflow from docs/PERF.md — knockout profiling over-
attributes (stubbing a stage DCEs its whole dependency chain); only the
trace is trustworthy.

Prints: total device ms, then the top-N rows with
  ms  count  name-stem  source
and a category rollup (gather/sort/copy/reshape/fusion/cumsum/kernels).
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "**", "*.trace.json.gz"), recursive=True
    ))
    if not hits:
        sys.exit(f"no *.trace.json.gz under {path}")
    return hits[-1]


def main():
    path = find_trace(sys.argv[1])
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    with gzip.open(path, "rt") as f:
        tr = json.load(f)

    # TensorCore op events live on pids whose process_name mentions TPU
    # core "/device:TPU" or "TensorCore"; host threads are excluded.
    dev_pids = set()
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "TensorCore" in nm or "/device" in nm:
                dev_pids.add(ev["pid"])
    # restrict to the "XLA Ops" thread lane: other lanes on the same pid
    # (modules, steps) carry umbrella copies that double-count
    op_tids = set()
    for ev in tr["traceEvents"]:
        if (ev.get("ph") == "M" and ev.get("name") == "thread_name"
                and ev.get("args", {}).get("name") == "XLA Ops"):
            op_tids.add((ev["pid"], ev["tid"]))

    by_key = defaultdict(lambda: [0.0, 0])
    by_scope = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for ev in tr["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        if op_tids and (ev["pid"], ev.get("tid")) not in op_tids:
            continue
        dur = ev.get("dur", 0) / 1000.0  # us -> ms
        name = ev.get("name", "")
        args = ev.get("args", {})
        # XLA op events carry long_name/source; skip scheduler lanes
        if not args and "." not in name and "%" not in name:
            continue
        src = args.get("source", "") or args.get("source_info", "")
        stem = re.sub(r"[.\d]+$", "", name)
        by_key[(stem, src)][0] += dur
        by_key[(stem, src)][1] += 1
        total += dur
        # roll up by frontend named_scope (jax.named_scope labels ride
        # in tf_op, e.g. .../body/closed_call/gpar/jit(_take)/gather)
        top = args.get("tf_op", "")
        scope = "<unscoped>"
        for part in top.split("/"):
            if part and "(" not in part and part not in (
                "while", "body", "closed_call", "cond", "transpose",
            ) and not part.startswith("jit"):
                scope = part.rstrip(":")
                break
        by_scope[scope][0] += dur
        by_scope[scope][1] += 1

    rows = sorted(by_key.items(), key=lambda kv: -kv[1][0])
    print(f"device total: {total:.2f} ms over {sum(c for _, (_, c) in rows)} op execs  [{path}]")
    for (stem, src), (ms, cnt) in rows[:topn]:
        print(f"{ms:9.3f} ms {cnt:6d}x  {stem:40s} {src[-60:]}")

    cats = {
        "gather": ("gather", "take", "dynamic-slice"),
        "sort": ("sort",),
        "copy": ("copy",),
        "reshape/transpose": ("reshape", "transpose", "bitcast"),
        "cumsum/reduce": ("cumsum", "reduce", "scan"),
        "pallas/custom": ("custom-call", "tpu_custom_call"),
        "fusion": ("fusion", "loop_"),
        "convert/pad/concat": ("convert", "pad", "concatenate"),
    }
    roll = defaultdict(float)
    for (stem, _), (ms, _c) in rows:
        low = stem.lower()
        hit = "other"
        for c, pats in cats.items():
            if any(p in low for p in pats):
                hit = c
                break
        roll[hit] += ms
    print("\ncategory rollup:")
    for c, ms in sorted(roll.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:9.3f} ms  {c}")

    print("\nnamed-scope rollup:")
    for sc, (ms, cnt) in sorted(by_scope.items(), key=lambda kv: -kv[1][0])[:30]:
        print(f"  {ms:9.3f} ms {cnt:7d}x  {sc}")


if __name__ == "__main__":
    main()
