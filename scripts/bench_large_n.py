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


def main():
    n_mol = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    from cavmd_tpu.core import PhysicalConstants as PC
    from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
    from cavmd_tpu.integrate import (
        ForceField, MethodSpec, init_state, make_step_fn, resolve_methods,
        run_steps,
    )

    # constant density relative to the 250-molecule reference scene
    box_L = 46.0 * (n_mol / 250.0) ** (1.0 / 3.0)
    snap = make_diatomic_system(n_mol, box_L=box_L, temperature_K=100.0,
                                seed=0, dtype=np.float64)
    snap = add_cavity_particle(snap, coupling=1e-3, freq_cm1=2000.0,
                               temperature_K=100.0, seed=1)
    snap = snap.astype(jnp.float32)
    ff = ForceField.create(snap, coupling=1e-3, freq_cm1=2000.0,
                           dtype=jnp.float32, pair_mode="cell")
    kT = PC.kT_from_kelvin(100.0)
    methods = resolve_methods(snap, (
        MethodSpec(kind="bussi", group="molecular", kT=kT,
                   tau=PC.ps_to_atomic_units(5.0)),
        MethodSpec(kind="langevin", group="cavity", kT=kT,
                   gamma=PC.gamma_from_tau_ps(5.0)),
    ), ff.l_typeid)
    step = make_step_fn(ff, methods)
    state = init_state(snap, ff, dt=PC.fs_to_atomic_units(0.25), seed=7)

    runner = jax.jit(lambda s, n: run_steps(step, s, n), static_argnums=(1,))
    chunk = 100
    state, _ = runner(state, chunk)
    jax.block_until_ready(state.position)

    n_chunks = 5
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, _ = runner(state, chunk)
    jax.block_until_ready(state.position)
    wall = time.perf_counter() - t0
    ms = wall / (n_chunks * chunk) * 1e3
    print(f"N={snap.N}: {ms:.2f} ms/step ({n_chunks * chunk / wall:.1f} steps/s)"
          f" [backend={jax.default_backend()}]")

    if "--profile" in sys.argv:
        d = sys.argv[sys.argv.index("--profile") + 1]
        with jax.profiler.trace(d):
            state, _ = runner(state, chunk)
            jax.block_until_ready(state.position)
        print(f"trace written to {d}")


if __name__ == "__main__":
    main()
