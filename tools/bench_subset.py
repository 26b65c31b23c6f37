#!/usr/bin/env python
"""Steal-aware subset bench wrapper for optimization A/Bs.

Usage: python tools/bench_subset.py <tag> <query> [query ...]

Runs `bench.py` with SPARK_GRAFT_BENCH_QUERIES set to the given list
(subset runs never clobber BENCH_LOCAL.json — bench.py's guard), and
brackets the run with /proc/stat CPU-steal readings. The sandbox's
hypervisor intermittently steals 2+ vCPUs, which the loadavg gate
cannot see and which inflated whole bench sweeps 10-20x this round —
every A/B number must carry its steal delta to be interpretable.

Prints one line: {"tag": ..., "steal_s": ..., "queries": {...}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_steal() -> float:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return int(parts[8]) / os.sysconf("SC_CLK_TCK")


def main() -> None:
    tag = sys.argv[1]
    queries = sys.argv[2:]
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_QUERIES"] = ",".join(queries)
    s0 = read_steal()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True,
    )
    s1 = read_steal()
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    rec = json.loads(line[-1]) if line else {"error": out.stderr[-500:]}
    print(json.dumps({
        "tag": tag,
        "steal_s": round(s1 - s0, 1),
        "value": rec.get("value"),
        "queries": rec.get("queries", rec),
    }))


if __name__ == "__main__":
    main()
