"""Micro-profile the domain rebuild cycle (parallel/domain.py) at S=1.

The S=1 overhead budget (docs/performance.md "Measured single-chip cost")
attributes ~1.9 ms/step at cadence 10 to the residency rebuild + relayout
that runs OUTSIDE ``shard_map`` every chunk. This script times the four
pieces of that cycle in isolation — ``_rebuild_one`` (global binning /
argsorts / table builds), ``_scatter_in`` (state + static-table relayout),
the sharded chunk itself, and ``_scatter_out`` — so optimization effort
goes where the milliseconds are, per the measurement-first house rule.

Usage: python scripts/profile_domain_rebuild.py [n_molecules] [--rebuild K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from cavmd_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()


def _time_fn(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("n_molecules", type=int, nargs="?", default=50_000)
    ap.add_argument("--rebuild", type=int, default=10)
    cli = ap.parse_args()

    from cavmd_tpu.core import PhysicalConstants as PC
    from cavmd_tpu.drivers.workloads import build_large_n
    from cavmd_tpu.integrate import MethodSpec, resolve_methods
    from cavmd_tpu.parallel import domain as D

    _, state, snap, ff = build_large_n(cli.n_molecules)
    kT = PC.kT_from_kelvin(100.0)
    methods = resolve_methods(snap, (
        MethodSpec(kind="bussi", group="molecular", kT=kT,
                   tau=PC.ps_to_atomic_units(5.0)),
        MethodSpec(kind="langevin", group="cavity", kT=kT,
                   gamma=PC.gamma_from_tau_ps(5.0)),
    ), ff.l_typeid)

    plan = D.plan_domain(snap, ff, 1)
    print(f"plan: Mrow={plan.Mrow} Mtot={plan.Mtot} nb_cap={plan.nb_cap} "
          f"ns_cap={plan.ns_cap} cap={plan.cap} C_ext={plan.C_ext} "
          f"H={plan.H} n0={plan.n0}")
    pack = ff.cell_pallas_pack

    rebuild = jax.jit(lambda p, b, q: D._rebuild_one(
        p, plan, b, ff.bond_k_per, ff.bond_r0_per, ff.pair_inert, q))
    scat_in = jax.jit(lambda st, da: D._scatter_in(st, da, plan, ff, pack))
    scat_out = jax.jit(
        lambda st, da, lo, re: D._scatter_out(st, da, lo, re, plan))

    ms_rb, data = _time_fn(rebuild, state.position, state.box_L,
                           state.charge)
    ms_si, (loc, dat, rep) = _time_fn(scat_in, state, data)
    ms_so, _ = _time_fn(scat_out, state, data, loc, rep)

    # the full runner at the same cadence for the end-to-end anchor
    run = D.make_domain_runner(ff, methods, plan,
                               rebuild_every=cli.rebuild)
    ms_all, _ = _time_fn(lambda s: run(s, cli.rebuild)[0], state, reps=10)

    glue = ms_rb + ms_si + ms_so
    print(f"rebuild      : {ms_rb:8.3f} ms")
    print(f"scatter_in   : {ms_si:8.3f} ms")
    print(f"scatter_out  : {ms_so:8.3f} ms")
    print(f"glue total   : {glue:8.3f} ms per rebuild "
          f"({glue / cli.rebuild:.3f} ms/step at cadence {cli.rebuild})")
    print(f"runner chunk : {ms_all:8.3f} ms per {cli.rebuild} steps "
          f"({ms_all / cli.rebuild:.3f} ms/step incl. glue)")


if __name__ == "__main__":
    main()
