"""Large-N single-chip benchmark: 50k diatomics + photon (N=100,001).

Full force mix in cell mode (carried cell list + Pallas fused cell
kernel), Bussi + Langevin baths — the scaling stress test from
docs/performance.md. The reference's GPU kernel refuses this size
outright (CavityForceComputeGPU.cu:395 caps N < 100k).

Usage: python scripts/bench_large_n.py [n_molecules] [--profile DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cavmd_tpu.utils.jitcache import enable_persistent_cache

enable_persistent_cache()


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("n_molecules", type=int, nargs="?", default=50_000)
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="write a jax.profiler trace of one chunk to DIR")
    ap.add_argument("--mesh", type=int, default=32,
                    help="PPPM mesh per axis (64 = constant-spacing mesh "
                         "at 100k; auto-selects the Pallas spread)")
    ap.add_argument("--pair-mode", default="cell",
                    choices=("cell", "zcol"),
                    help="bucket-tile Pallas kernel (cell) or the z-sorted "
                         "column kernel (zcol, round 3)")
    ap.add_argument("--bi", type=int, default=None,
                    help="zcol i-block rows (sweep knob; default kernel's). "
                         "The planned visit window W assumes the default "
                         "bi — a custom bi that overflows it trips the "
                         "window-overflow channel rather than dropping "
                         "pairs silently")
    cli = ap.parse_args()
    n_mol = cli.n_molecules

    if cli.bi is not None:
        import functools as _ft

        import cavmd_tpu.ops.pallas_kernels as _pk

        _pk.fused_zsort_cols_pallas = _ft.partial(
            _pk.fused_zsort_cols_pallas.__wrapped__
            if hasattr(_pk.fused_zsort_cols_pallas, "__wrapped__")
            else _pk.fused_zsort_cols_pallas,
            bi=cli.bi,
        )
    from cavmd_tpu.drivers.workloads import build_large_n

    runner, state, snap, ff = build_large_n(
        n_mol, mesh=(cli.mesh,) * 3, pair_mode=cli.pair_mode,
    )
    chunk = 100
    state, _ = runner(state, chunk)
    jax.block_until_ready(state.position)

    n_chunks = 5
    e_univ = []
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, obs = runner(state, chunk)
        e_univ.append(obs)
    jax.block_until_ready(state.position)
    wall = time.perf_counter() - t0
    ms = wall / (n_chunks * chunk) * 1e3
    print(f"N={snap.N}: {ms:.2f} ms/step ({n_chunks * chunk / wall:.1f} steps/s)"
          f" [backend={jax.default_backend()}]")

    # physics sanity at scale: the universe energy (system + reservoirs)
    # must be conserved across the timed window (f32, thermostatted).
    # Measured context (v5e, N=100k): the band is ~1.4 Ha at dt=0.25 fs,
    # 0.38 at 0.125, 0.11 at 0.0625 — clean dt^2 velocity-Verlet error on
    # the ~30 Ha cavity dipole-self oscillation (corr +0.96), identical
    # between the Pallas and XLA pair paths. Not a precision or kernel
    # artifact; the reference's adaptive dt exists for exactly this.
    from cavmd_tpu.integrate import universe_energy

    eu = np.concatenate([np.asarray(universe_energy(o)) for o in e_univ])
    per_chunk = [
        float(np.ptp(np.asarray(universe_energy(o)))) for o in e_univ
    ]
    print(f"universe-energy drift over {len(eu)} steps: "
          f"{eu.max() - eu.min():.2e} Ha (N={snap.N}, f32; per-chunk "
          f"{['%.1e' % p for p in per_chunk]})")
    assert not np.any(np.concatenate(
        [np.asarray(o["cell_overflow"]) for o in e_univ]))

    # --- utilization figure (VERDICT r1 item 10) -----------------------
    # The step is dominated by the Pallas cell tile pass (compute-bound:
    # its HBM traffic is ~120 MB/step = ~0.15 ms at v5e's 819 GB/s, far
    # below its runtime). Report the sustained pair-slot throughput and
    # the implied VPU f32 op rate so "actually fast" is measured against
    # hardware, not only against the reference CPU anchor.
    from cavmd_tpu.ops.neighbor import CellListConfig

    cfg = CellListConfig(*ff.cell_cfg)
    C, cap = cfg.total_cells, cfg.cap
    if cli.pair_mode == "zcol":
        # measure the predicate's actual tile count from the carried list
        from cavmd_tpu.ops.neighbor import build_zcol_list

        zl = jax.jit(lambda p: build_zcol_list(p, snap.box_L, cfg))(
            state.position
        )
        occ = np.asarray(jnp.sum(zl.bucket_idx < snap.N, axis=1))
        print(f"zcol: XY={C} columns, cap={cap}, occupancy "
              f"mean {occ.mean():.1f} max {occ.max()} "
              f"(cap margin {cap / max(occ.mean(), 1):.2f}x)")
        pair_slots = None
    else:
        # two-tier-aware slot count: tier 1 (rows [0:s1]) runs for every
        # cell; tier 2 ([s1:cap]) only where the occupancy predicate
        # fires (mirror of the s1 default in fused_cell_cols_pallas)
        from cavmd_tpu.ops.neighbor import build_cell_list

        lanes = ((27 * cap + 127) // 128) * 128
        cl = jax.jit(
            lambda p: build_cell_list(p, snap.box_L, cfg, ff.cell_neighbors)
        )(state.position)
        occ = np.asarray(jnp.sum(cl.bucket_idx < snap.N, axis=1))
        mean_occ = snap.N / max(C, 1)
        s1 = max(8, min(int((mean_occ + np.sqrt(mean_occ)) // 8) * 8, cap))
        tier2_cells = int((occ > s1).sum())
        pair_slots = lanes * (C * s1 + tier2_cells * (cap - s1))
        print(f"two-tier tile: s1={s1}, cap={cap}, tier-2 cells "
              f"{tier2_cells}/{C} ({100.0 * tier2_cells / C:.0f}%)")
    if pair_slots is not None:
        ops_per_slot = 50  # counted from _fused_tile (wrap=False, factored
        # LJ rows): dx/r2 8, masks+r2_safe 12, LJ params 5, rsqrt chain 3,
        # s6/s12/shift 9, e/f_lj 5, qq/erfc poly+exp ~16, e/f_ew 9 — minus
        # shared subexpressions
        kernel_frac = 0.55  # tile share of the step (xprof op profile)
        slot_rate = pair_slots / (ms * 1e-3 * kernel_frac)
        print(
            f"tile pass: {pair_slots/1e6:.0f}M computed pair-slots/step, "
            f"~{slot_rate/1e9:.1f}G slots/s sustained, "
            f"~{slot_rate*ops_per_slot/1e12:.2f}T f32 VPU op/s "
            f"(v5e VPU order-of-peak ~4-8T/s incl. FMA; "
            f"HBM-roofline share <2%, i.e. compute-bound)"
        )

    if cli.profile:
        with jax.profiler.trace(cli.profile):
            state, _ = runner(state, chunk)
            jax.block_until_ready(state.position)
        print(f"trace written to {cli.profile}")


if __name__ == "__main__":
    main()
