"""Single-chip cost of the domain-decomposed pipeline (parallel/domain.py).

Times the slab runner at S=1 against the unsharded production runner on
the same large-N workload — the honest per-chip price of the multi-chip
layout (fattened x cell width for molecule-granular residency, periodic
residency rebuilds outside shard_map, the self-ppermute halo). Real >1
chip is unavailable here (SURVEY.md env), so this plus the virtual-mesh
fidelity tests (tests/test_domain.py) is the measurable part of the
scaling story: aggregate multi-chip throughput ~= S x (unsharded rate) /
(1 + overhead) while the halo (2 x H x 12 bytes/step) stays under the ICI
budget — see docs/performance.md "Multi-chip" table.

Usage: python scripts/bench_domain_s1.py [n_molecules] [--rebuild K]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from cavmd_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()


def _time(run, state, chunk, n_chunks):
    state, _ = run(state, chunk)  # warm-up at the SAME static length
    jax.block_until_ready(state.position)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, obs = run(state, chunk)
    jax.block_until_ready(state.position)
    return (time.perf_counter() - t0) / (n_chunks * chunk) * 1e3, obs


def main():
    import argparse

    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("n_molecules", type=int, nargs="?", default=50_000)
    ap.add_argument("--rebuild", type=int, default=10,
                    help="domain residency-rebuild cadence (steps)")
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--skip-ref", action="store_true",
                    help="skip the unsharded reference leg")
    ap.add_argument("--s1", type=int, default=None,
                    help="two-tier i-row split (sweep knob)")
    ap.add_argument("--jsplit", type=int, default=None,
                    help="j-window capacity split (sweep knob; 0 disables)")
    cli = ap.parse_args()

    from cavmd_tpu.drivers.workloads import build_large_n
    from cavmd_tpu.parallel.domain import make_domain_runner, plan_domain

    runner, state, snap, ff = build_large_n(cli.n_molecules)
    from cavmd_tpu.integrate import MethodSpec, resolve_methods
    from cavmd_tpu.core import PhysicalConstants as PC

    kT = PC.kT_from_kelvin(100.0)
    methods = resolve_methods(snap, (
        MethodSpec(kind="bussi", group="molecular", kT=kT,
                   tau=PC.ps_to_atomic_units(5.0)),
        MethodSpec(kind="langevin", group="cavity", kT=kT,
                   gamma=PC.gamma_from_tau_ps(5.0)),
    ), ff.l_typeid)

    ms_ref = None
    if not cli.skip_ref:
        ms_ref, _ = _time(runner, state, cli.chunk, 3)
        print(f"unsharded runner: {ms_ref:.2f} ms/step "
              f"(N={snap.N}, backend={jax.default_backend()})")

    plan = plan_domain(snap, ff, 1)
    run_dom = make_domain_runner(ff, methods, plan,
                                 rebuild_every=cli.rebuild,
                                 s1=cli.s1, jsplit=cli.jsplit)
    ms_dom, obs = _time(run_dom, state, cli.chunk, 3)
    assert not np.asarray(obs["cell_overflow"]).any(), "overflow"
    halo_kb = 2 * plan.H * 12 / 1024
    print(f"domain S=1 runner: {ms_dom:.2f} ms/step "
          f"(rebuild every {cli.rebuild}; grid {plan.ncells}, "
          f"cap {plan.cap}, halo 2x{plan.H} rows = {halo_kb:.0f} KB/step)")
    if ms_ref is not None:
        print(f"single-chip overhead: {(ms_dom / ms_ref - 1) * 100:+.1f}%")


if __name__ == "__main__":
    main()
