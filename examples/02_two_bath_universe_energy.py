#!/usr/bin/env python3
"""The reference workflow's physics in ~40 lines: Bussi molecular bath +
Langevin cavity bath, with the conserved universe energy
(system + reservoirs) as the correctness diagnostic."""

import jax

# conservation demo: run in float64 on CPU (TPU runs use f32;
# see docs/architecture.md 'Precision')
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from cavmd_tpu.core import PhysicalConstants as PC
from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
from cavmd_tpu.integrate import (
    ForceField,
    MethodSpec,
    init_state,
    make_step_fn,
    resolve_methods,
    run_steps,
    thermalize_velocities,
    master_key,
    universe_energy,
)
from cavmd_tpu.utils import fire_minimize


def main():
    kT = PC.kT_from_kelvin(100.0)
    snap = make_diatomic_system(100, box_L=36.0, seed=0)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=1
    )
    ff = ForceField.create(snap, coupling=1e-3, freq_cm1=2000.0)
    snap = fire_minimize(snap, ff, n_steps=300)
    mol = snap.typeid != ff.l_typeid
    v = thermalize_velocities(master_key(2), snap.mass, mol, kT)
    v = v + thermalize_velocities(
        master_key(3), snap.mass, ~mol, kT, remove_drift=False
    )
    snap = snap.replace(velocity=v)

    methods = resolve_methods(snap, (
        MethodSpec(kind="bussi", group="molecular", kT=kT,
                   tau=PC.ps_to_atomic_units(5.0)),
        MethodSpec(kind="langevin", group="cavity", kT=kT,
                   gamma=PC.gamma_from_tau_ps(5.0)),
    ), ff.l_typeid)
    step = jax.jit(make_step_fn(ff, methods))
    state = init_state(snap, ff, dt=PC.fs_to_atomic_units(0.25), seed=4)

    final, obs = run_steps(step, state, 4000)
    U = np.asarray(universe_energy(obs))
    T = np.asarray(obs["kinetic_molecular"]) * 2 / (
        3 * int(mol.sum()) * PC.KB_HARTREE_PER_K
    )
    print(f"universe energy drift over {float(final.time_au)*PC.TIME_PS_CONVERSION:.2f} ps: "
          f"{np.abs(U - U[0]).max():.3e} Ha")
    print(f"molecular T: {T[-500:].mean():.1f} K (target 100)")
    print(f"Bussi reservoir: {float(final.bussi_reservoir[0]):+.5f} Ha, "
          f"Langevin cavity reservoir: {float(final.langevin_reservoir[1]):+.5f} Ha")


if __name__ == "__main__":
    main()
