"""Is the residency rebuild partitioned at S>1, or replicated per chip?

The rebuild + relayout (``_rebuild_one`` / ``_scatter_in``) runs inside
the jitted domain runner BETWEEN shard_map chunks, on mesh-replicated
state. docs/performance.md models it as fully replicated (per-chip wall
cost constant in S — the serial fraction at scale). But its outputs feed
the chunk ``shard_map`` with ``in_specs=P('atoms')``, and XLA's sharding
propagation can push that backward into the producing gathers,
partitioning them by output rows (each chip gathers only ITS slab's
rows from the replicated tables).

This script compiles the S=8 runner on the virtual CPU mesh and greps
the optimized (SPMD-partitioned) HLO for the relayout's wide row
gathers: a partitioned gather's output shape is 1/S of the logical
row count. Run:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/inspect_rebuild_sharding.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# f32 so the prejoined Pallas static table forms (joined is dtype-gated)
# and the production relayout's ONE wide row gather appears in the HLO
jax.config.update("jax_enable_x64", False)


def main():
    from cavmd_tpu.core import PhysicalConstants as PC
    from cavmd_tpu.drivers.workloads import build_large_n
    from cavmd_tpu.integrate import MethodSpec, resolve_methods
    from cavmd_tpu.parallel.domain import make_domain_runner, plan_domain

    n_mol = 5_000
    S = 8
    _, state, snap, ff = build_large_n(n_mol)
    kT = PC.kT_from_kelvin(100.0)
    methods = resolve_methods(snap, (
        MethodSpec(kind="bussi", group="molecular", kT=kT,
                   tau=PC.ps_to_atomic_units(5.0)),
        MethodSpec(kind="langevin", group="cavity", kT=kT,
                   gamma=PC.gamma_from_tau_ps(5.0)),
    ), ff.l_typeid)
    plan = plan_domain(snap, ff, S)
    # interpret=True turns the Pallas pack on off-TPU, matching the
    # production (TPU) relayout structure; we only lower+compile
    run = make_domain_runner(ff, methods, plan, rebuild_every=5,
                             interpret=True)

    # the runner wraps the jitted _run in a device_put closure; pull the
    # jittable out of the closure cells to lower + dump optimized HLO
    jitted = next(
        c.cell_contents for c in run.__closure__
        if hasattr(c.cell_contents, "lower")
    )
    hlo = jitted.lower(state, 5).compile().as_text()

    n_rows = plan.S * (plan.Mtot + 1)
    per_shard = n_rows // S
    print(f"plan: S={S} Mtot={plan.Mtot} -> relayout rows total {n_rows}, "
          f"per-shard {per_shard}")

    def nbytes(shape_str, dt):
        dims = [int(d) for d in shape_str.split(",") if d]
        b = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1}.get(dt, 4)
        n = 1
        for d in dims:
            n *= d
        return n * b, dims

    rows = []
    for l in hlo.splitlines():
        if " gather(" not in l and " scatter(" not in l:
            continue
        m = re.search(r"(f32|f64|s32|u32|pred)\[([\d,]*)\]", l)
        if not m:
            continue
        sz, dims = nbytes(m.group(2), m.group(1))
        kind = "gather" if " gather(" in l else "scatter"
        rows.append((sz, dims, kind, l.strip()[:120]))
    rows.sort(reverse=True)
    print(f"{len(rows)} gather/scatter ops; largest outputs:")
    for sz, dims, kind, txt in rows[:12]:
        tag = ("PER-SHARD" if dims and abs(dims[0] - per_shard) <= 2
               else "FULL-ROWS" if dims and dims[0] >= n_rows
               else "GLOBAL-N" if dims and abs(dims[0] - plan.n0) <= 2
               else "")
        print(f"  {sz/1e6:8.2f} MB {kind:7s} dims={dims} {tag}\n     {txt}")


if __name__ == "__main__":
    main()
