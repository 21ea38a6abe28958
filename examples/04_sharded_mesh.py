#!/usr/bin/env python3
"""Mesh sharding: the full (replica x atoms) SPMD layout.

Runs on whatever devices are available; to emulate an 8-chip pod on CPU:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/04_sharded_mesh.py
"""

import jax
import numpy as np

from cavmd_tpu.core import PhysicalConstants as PC
from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
from cavmd_tpu.integrate import ForceField, MethodSpec, make_step_fn, resolve_methods
from cavmd_tpu.parallel import (
    init_replica_states,
    make_mesh,
    make_sharded_runner,
    pad_snapshot_to,
    shard_state,
)
from cavmd_tpu.parallel.replicas import make_replica_step


def main():
    if "cpu" in str(jax.devices()[0]).lower():
        jax.config.update("jax_platforms", "cpu")
    n_dev = len(jax.devices())
    n_rep = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    n_shards = n_dev // n_rep
    print(f"devices: {n_dev} -> mesh (replica={n_rep}, atoms={n_shards})")

    kT = PC.kT_from_kelvin(100.0)
    snap = make_diatomic_system(64, box_L=32.0, seed=0)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=1
    )
    snap, pad = pad_snapshot_to(snap, n_shards)
    ff = ForceField.create(snap, coupling=1e-3)

    methods = resolve_methods(snap, (
        MethodSpec(kind="bussi", group="molecular", kT=kT,
                   tau=PC.ps_to_atomic_units(5.0)),
        MethodSpec(kind="langevin", group="cavity", kT=kT,
                   gamma=PC.gamma_from_tau_ps(5.0)),
    ), ff.l_typeid)
    vstep = make_replica_step(make_step_fn(ff, methods))

    mesh = make_mesh(n_replica=n_rep, n_atoms_shards=n_shards)
    batched = init_replica_states(
        snap, ff, n_replicas=n_rep, dt=PC.fs_to_atomic_units(0.25),
        seed=0, kT=kT,
    )
    sstate = shard_state(batched, mesh, batched=True)
    runner = make_sharded_runner(vstep, mesh, batched, batched=True)
    final, obs = runner(sstate, 200)
    ke = np.asarray(obs["kinetic_molecular"])
    print(f"ran 200 sharded steps; final molecular KE per replica: "
          f"{np.asarray(ke)[-1]}")


if __name__ == "__main__":
    main()
