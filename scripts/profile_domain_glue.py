"""Per-op TPU breakdown of the domain rebuild glue (xprof parse).

Companion to scripts/profile_domain_rebuild.py: that script showed the
rebuild + scatter_in + scatter_out glue costs ~2.5 ms/step at cadence 10
(docs/performance.md "Measured single-chip cost"); this one attributes it
op-by-op so the cut lands on the real hot spot (1-D scatters and
associative scans are the suspected offenders — TPU serializes scalar
scatter rows, and micro-benches put them at ~1 ms per 100k elements).

Usage: python scripts/profile_domain_glue.py [n_molecules]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cavmd_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()


def profile_fn(label, fn, args, top=14, reps=40):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3

    tracedir = tempfile.mkdtemp(prefix="glue_trace_")
    with jax.profiler.trace(tracedir):
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)

    from xprof.convert import raw_to_tool_data as rtd

    f = glob.glob(os.path.join(tracedir, "plugins/profile/*/*.xplane.pb"))
    data, _ = rtd.xspace_to_tool_data(f, "op_profile", {})
    d = json.loads(data)

    rows = []

    def leaves(node, out):
        kids = node.get("children", [])
        if not kids:
            out.append(node.get("name", "?"))
        for k in kids:
            leaves(k, out)

    def walk(node, path):
        kids = node.get("children", [])
        name = node.get("name", "?")
        raw = node.get("metrics", {}).get("rawTime", 0)
        self_raw = raw - sum(
            k.get("metrics", {}).get("rawTime", 0) for k in kids
        )
        if self_raw > 0:
            ops = []
            leaves(node, ops)
            rows.append((self_raw, name, ops))
        for k in kids:
            walk(k, path + "/" + name)

    root = d["byProgram"]
    walk(root, "")
    total = root.get("metrics", {}).get("rawTime", 1) or 1
    rows.sort(reverse=True)
    print(f"--- {label}: {ms:.3f} ms ---")
    for raw, name, ops in rows[:top]:
        uniq = []
        for o in ops:
            base = o.split(".")[0]
            if base not in uniq:
                uniq.append(base)
        print(f"{100 * raw / total:6.2f}%  {ms * raw / total:7.3f} ms  "
              f"{name}: {','.join(uniq[:8])}")
    return ms


def main():
    import jax

    from cavmd_tpu.drivers.workloads import build_large_n
    from cavmd_tpu.parallel import domain as D

    n_mol = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    _, state, snap, ff = build_large_n(n_mol)
    plan = D.plan_domain(snap, ff, 1)
    pack = ff.cell_pallas_pack

    import jax.numpy as jnp

    joined = None
    if pack is not None and pack.static_rows.dtype == ff.cell_features.dtype:
        joined = jnp.concatenate([ff.cell_features, pack.static_rows], 1)
    rebuild = jax.jit(lambda p, b, q: D._rebuild_one(
        p, plan, b, ff.bond_k_per, ff.bond_r0_per, ff.pair_inert, q))
    scat_in = jax.jit(
        lambda st, da: D._scatter_in(st, da, plan, ff, pack, joined))
    scat_out = jax.jit(
        lambda st, da, lo, re: D._scatter_out(st, da, lo, re, plan))

    ms1 = profile_fn("rebuild", rebuild,
                     (state.position, state.box_L, state.charge))
    data = rebuild(state.position, state.box_L, state.charge)
    ms2 = profile_fn("scatter_in", scat_in, (state, data))
    loc, dat, rep = scat_in(state, data)
    ms3 = profile_fn("scatter_out", scat_out, (state, data, loc, rep))
    print(f"glue total: {ms1 + ms2 + ms3:.3f} ms per rebuild")


if __name__ == "__main__":
    main()
