#!/usr/bin/env python3
"""Reproduce the reference's headline validation on one TPU chip in ~30 s.

The cav-hoomd notebook's only quantitative result (BASELINE.md): universe
energy (system + reservoirs) drifts 0.0055 Ha over 50.9 ps at 501 particles
with Bussi + Langevin baths — a ~4.5 h CPU run. This script runs the same
50 ps of physics on the default accelerator (f32) and prints the drift.

Expected on a v5e chip: ~30 s wall, drift ~3e-4 Ha (18x tighter), final
T ~ 100 K.
"""

import time

import jax
import numpy as np
import jax.numpy as jnp

from cavmd_tpu.core import PhysicalConstants as PC
from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
from cavmd_tpu.integrate import (
    ForceField,
    MethodSpec,
    init_state,
    make_step_fn,
    master_key,
    resolve_methods,
    run_steps,
    thermalize_velocities,
    universe_energy,
)
from cavmd_tpu.utils import fire_minimize


def main(runtime_ps=50.0, dt_fs=0.25):
    snap = make_diatomic_system(250, box_L=46.0, seed=0, dtype=np.float64)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=1
    ).astype(jnp.float32)
    ff = ForceField.create(snap, coupling=1e-3, dtype=jnp.float32)
    snap = fire_minimize(snap, ff, n_steps=300)

    kT = PC.kT_from_kelvin(100.0)
    mol = snap.typeid != ff.l_typeid
    v = thermalize_velocities(master_key(5), snap.mass, mol, kT)
    v = v + thermalize_velocities(
        master_key(6), snap.mass, ~mol, kT, remove_drift=False
    )
    snap = snap.replace(velocity=v)

    methods = resolve_methods(snap, (
        MethodSpec(kind="bussi", group="molecular", kT=kT,
                   tau=PC.ps_to_atomic_units(5.0)),
        MethodSpec(kind="langevin", group="cavity", kT=kT,
                   gamma=PC.gamma_from_tau_ps(5.0)),
    ), ff.l_typeid)
    step = make_step_fn(ff, methods)
    runner = jax.jit(lambda s, n: run_steps(step, s, n), static_argnums=(1,))

    dt = PC.fs_to_atomic_units(dt_fs)
    n_steps = int(PC.ps_to_atomic_units(runtime_ps) / dt)
    chunk = 10_000
    state = init_state(snap, ff, dt=dt, seed=11)

    print(f"running {n_steps} steps ({runtime_ps} ps) on "
          f"{jax.devices()[0]} ...")
    t0 = time.time()
    U0, drift = None, 0.0
    done = 0
    while done < n_steps:
        state, obs = runner(state, chunk)
        U = np.asarray(universe_energy(obs))
        if U0 is None:
            U0 = U[0]
        drift = max(drift, float(np.abs(U - U0).max()))
        done += chunk
    wall = time.time() - t0
    ke = float(np.asarray(obs["kinetic_molecular"])[-1])
    T = 2 * ke / (3 * int(mol.sum()) * PC.KB_HARTREE_PER_K)
    print(f"wall time: {wall:.1f} s ({done / wall:.0f} steps/s)")
    print(f"universe drift over {runtime_ps} ps: {drift:.2e} Ha "
          f"(reference anchor: 5.5e-3 Ha)")
    print(f"final molecular T: {T:.1f} K (target 100)")


if __name__ == "__main__":
    main()
