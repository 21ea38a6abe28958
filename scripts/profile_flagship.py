"""Per-op TPU time breakdown of the N=501 flagship step (xprof parse).

Traces one warmed 1000-step scan chunk and prints the top ops by
self-time — the measurement tool behind docs/performance.md's step
budgets. Usage: python scripts/profile_flagship.py [--replicas B]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=0)
    ap.add_argument("--top", type=int, default=25)
    cli = ap.parse_args()

    import jax

    from cavmd_tpu.integrate import run_steps
    from __graft_entry__ import _build

    step, state, snap, ff, methods, kT = _build()
    if cli.replicas:
        from cavmd_tpu.core import PhysicalConstants as PC
        from cavmd_tpu.parallel import init_replica_states, make_replica_step

        state = init_replica_states(
            snap, ff, n_replicas=cli.replicas,
            dt=PC.fs_to_atomic_units(0.25), seed=0, kT=kT,
        )
        step = make_replica_step(step)

    runner = jax.jit(lambda s, n: run_steps(step, s, n), static_argnums=(1,))
    state, _ = runner(state, 1000)
    jax.block_until_ready(state.position)

    import time

    t0 = time.perf_counter()
    state, _ = runner(state, 1000)
    jax.block_until_ready(state.position)
    wall = time.perf_counter() - t0
    print(f"step: {wall:.3f} s / 1000 steps = {wall * 1e3:.1f} us/step"
          f" ({1000 / wall:.0f} steps/s)")

    tracedir = tempfile.mkdtemp(prefix="flagship_trace_")
    with jax.profiler.trace(tracedir):
        state, _ = runner(state, 1000)
        jax.block_until_ready(state.position)

    from xprof.convert import raw_to_tool_data as rtd

    f = glob.glob(os.path.join(tracedir, "plugins/profile/*/*.xplane.pb"))
    data, _ = rtd.xspace_to_tool_data(f, "op_profile", {})
    d = json.loads(data)

    rows = []

    def walk(node, path):
        kids = node.get("children", [])
        name = node.get("name", "?")
        raw = node.get("metrics", {}).get("rawTime", 0)
        # self-time: fusions carry their time on the parent node, with
        # constituent-op children that have no rawTime of their own
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
    print(f"{'%':>6}  op")
    for raw, name, path in rows[: cli.top]:
        print(f"{100 * raw / total:6.2f}  {name}")


if __name__ == "__main__":
    main()
