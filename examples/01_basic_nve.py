#!/usr/bin/env python3
"""Minimal example: NVE cavity MD with energy conservation check.

Generates a small O2/N2 scene, injects the photon, and runs NVE velocity
Verlet — total energy should be conserved to discretization error.
"""

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
    potential_energy,
    resolve_methods,
    run_steps,
)
from cavmd_tpu.utils import fire_minimize


def main():
    snap = make_diatomic_system(50, box_L=30.0, temperature_K=100.0, seed=0)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=1
    )
    ff = ForceField.create(snap, coupling=1e-3, freq_cm1=2000.0)
    snap = fire_minimize(snap, ff, n_steps=200)

    methods = resolve_methods(
        snap, (MethodSpec(kind="nve", group="all"),), ff.l_typeid
    )
    step = jax.jit(make_step_fn(ff, methods))
    state = init_state(snap, ff, dt=PC.fs_to_atomic_units(0.25), seed=2)

    final, obs = run_steps(step, state, 2000)
    E = np.asarray(
        potential_energy(obs) + obs["kinetic_molecular"] + obs["kinetic_cavity"]
    )
    print(f"ran 2000 NVE steps ({float(final.time_au) * PC.TIME_PS_CONVERSION:.3f} ps)")
    print(f"total energy drift: {np.abs(E - E[0]).max():.3e} Ha")


if __name__ == "__main__":
    main()
