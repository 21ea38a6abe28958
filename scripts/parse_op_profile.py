"""Print the top ops by TPU self-time from a jax.profiler trace dir.

Companion to `scripts/bench_large_n.py --profile DIR` and any other
`jax.profiler.trace` capture; the same xprof op-profile walk as
scripts/profile_flagship.py, exposed for arbitrary traces.

Usage: python scripts/parse_op_profile.py TRACE_DIR [--top N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def op_profile_rows(tracedir):
    """[(self_raw_time, op_name, path)] sorted descending, plus total."""
    from xprof.convert import raw_to_tool_data as rtd

    f = glob.glob(os.path.join(tracedir, "plugins/profile/*/*.xplane.pb"))
    if not f:
        raise FileNotFoundError(f"no xplane.pb under {tracedir}")
    data, _ = rtd.xspace_to_tool_data(f, "op_profile", {})
    d = json.loads(data)

    rows = []

    def walk(node, path):
        kids = node.get("children", [])
        name = node.get("name", "?")
        raw = node.get("metrics", {}).get("rawTime", 0)
        self_raw = raw - sum(
            k.get("metrics", {}).get("rawTime", 0) for k in kids
        )
        if self_raw > 0:
            rows.append((self_raw, name, path))
        for k in kids:
            walk(k, path + "/" + name)

    root = d["byProgram"]
    walk(root, "")
    total = root.get("metrics", {}).get("rawTime", 1) or 1
    rows.sort(reverse=True)
    return rows, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tracedir")
    ap.add_argument("--top", type=int, default=30)
    cli = ap.parse_args()
    rows, total = op_profile_rows(cli.tracedir)
    print(f"{'%':>6}  op")
    for raw, name, path in rows[: cli.top]:
        print(f"{100 * raw / total:6.2f}  {name}")


if __name__ == "__main__":
    main()
