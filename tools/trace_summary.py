"""Summarize a DSM_TRACE / jax.profiler trace: top XLA device ops.

Usage: python tools/trace_summary.py <trace_dir> [top_n]
Reads the newest vm.trace.json.gz under <trace_dir>/plugins/profile/.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys


def main() -> None:
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    paths = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace files under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_lane = {k for k, v in tids.items() if v == "XLA Ops"}
    dur = collections.Counter()
    cnt = collections.Counter()
    args = {}
    for e in ev:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_lane:
            n = e["name"]
            dur[n] += e.get("dur", 0)
            cnt[n] += 1
            args.setdefault(n, e.get("args", {}))
    total = sum(dur.values())
    print(f"file: {paths[-1]}")
    print(f"XLA device-op total: {total/1e6:.2f}s")
    for name, d in dur.most_common(top_n):
        extra = (args[name].get("long_name") or "")[:78]
        print(f"{d/1e3:9.1f} ms {cnt[name]:6d}x  {name:22s} {extra}")


if __name__ == "__main__":
    main()
