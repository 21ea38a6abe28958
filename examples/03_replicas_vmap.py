#!/usr/bin/env python3
"""Replica parallelism: a batch of independent trajectories advanced by one
vmapped program (the TPU-native form of the reference's SLURM array jobs)."""

import jax
import numpy as np

from cavmd_tpu.core import PhysicalConstants as PC
from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
from cavmd_tpu.integrate import ForceField, MethodSpec, make_step_fn, resolve_methods
from cavmd_tpu.parallel import init_replica_states, run_replica_steps, split_replica_obs
from cavmd_tpu.utils import fire_minimize


def main(n_replicas=8):
    kT = PC.kT_from_kelvin(100.0)
    snap = make_diatomic_system(50, box_L=30.0, seed=0)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=1
    )
    ff = ForceField.create(snap, coupling=1e-3)
    snap = fire_minimize(snap, ff, n_steps=200)

    methods = resolve_methods(snap, (
        MethodSpec(kind="bussi", group="molecular", kT=kT,
                   tau=PC.ps_to_atomic_units(5.0)),
        MethodSpec(kind="langevin", group="cavity", kT=kT,
                   gamma=PC.gamma_from_tau_ps(5.0)),
    ), ff.l_typeid)
    step = make_step_fn(ff, methods)

    batched = init_replica_states(
        snap, ff, n_replicas=n_replicas,
        dt=PC.fs_to_atomic_units(0.25), seed=100, kT=kT,
    )
    runner = jax.jit(lambda s: run_replica_steps(step, s, 300))
    final, obs = runner(batched)

    per = split_replica_obs(obs, n_replicas)
    for r, o in enumerate(per):
        ke = o["kinetic_molecular"][-100:].mean()
        T = 2 * ke / (3 * (snap.N - 1) * PC.KB_HARTREE_PER_K)
        print(f"replica {r}: <T> = {T:.1f} K, "
              f"cavity KE = {o['kinetic_cavity'][-1]:.2e} Ha")


if __name__ == "__main__":
    main()
