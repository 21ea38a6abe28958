"""Parallel layer: vmapped replicas and mesh-sharded steps on the virtual
8-device CPU mesh. Sharded results must match unsharded bit-for-bit-ish."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavmd_tpu.core import PhysicalConstants as PC
from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
from cavmd_tpu.integrate import (
    ForceField,
    MethodSpec,
    init_state,
    make_step_fn,
    resolve_methods,
    run_steps,
)
from cavmd_tpu.parallel import (
    init_replica_states,
    make_mesh,
    make_sharded_runner,
    pad_snapshot_to,
    run_replica_steps,
    shard_state,
    split_replica_obs,
)


@pytest.fixture(scope="module")
def system():
    snap = make_diatomic_system(12, box_L=20.0, temperature_K=100.0, seed=51)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=52
    )
    snap, pad = pad_snapshot_to(snap, 8)  # 25 -> 32 particles
    assert snap.N % 8 == 0
    ff = ForceField.create(snap, coupling=1e-3, pppm_mesh=(16, 16, 16), r_cut=9.0)
    kT = PC.kT_from_kelvin(100.0)
    methods = resolve_methods(
        snap,
        (
            MethodSpec(kind="bussi", group="molecular", kT=kT,
                       tau=PC.ps_to_atomic_units(5.0)),
            MethodSpec(kind="langevin", group="cavity", kT=kT,
                       gamma=PC.gamma_from_tau_ps(5.0)),
        ),
        ff.l_typeid,
    )
    return snap, ff, methods, kT


def test_ghost_padding_inert(system):
    """Padded ghost particles must not exert or feel forces."""
    snap, ff, methods, kT = system
    f, _ = ff.compute(
        snap.position, snap.image, snap.box_L, snap.charge, snap.typeid,
        snap.bond_group, snap.bond_typeid,
    )
    ghost = np.asarray(snap.typeid) == len(snap.types) - 1
    assert ghost.sum() == 7
    np.testing.assert_allclose(np.asarray(f)[ghost], 0.0, atol=1e-12)


def test_replica_vmap(system):
    snap, ff, methods, kT = system
    step = make_step_fn(ff, methods)
    dt = PC.fs_to_atomic_units(0.5)
    batched = init_replica_states(
        snap, ff, n_replicas=4, dt=dt, seed=100, kT=kT
    )
    assert batched.position.shape == (4, snap.N, 3)
    final, obs = jax.jit(
        lambda s: run_replica_steps(step, s, 50)
    )(batched)
    assert obs["kinetic_molecular"].shape == (50, 4)
    per = split_replica_obs(obs, 4)
    assert len(per) == 4
    # replicas decorrelate: different seeds -> different trajectories
    p = np.asarray(final.position)
    assert not np.allclose(p[0], p[1])
    # single-replica run with same seed matches the batched row
    s0 = init_replica_states(snap, ff, n_replicas=1, dt=dt, seed=100, kT=kT)
    f0, _ = jax.jit(lambda s: run_replica_steps(step, s, 50))(s0)
    np.testing.assert_allclose(
        np.asarray(f0.position)[0], p[0], rtol=1e-12, atol=1e-12
    )


def test_sharded_step_matches_unsharded(system):
    """The mesh-sharded step must reproduce the single-device trajectory."""
    snap, ff, methods, kT = system
    step = make_step_fn(ff, methods)
    dt = PC.fs_to_atomic_units(0.5)
    state = init_state(snap, ff, dt=dt, seed=9)

    # unsharded reference
    ref_final, ref_obs = jax.jit(
        lambda s: run_steps(step, s, 20)
    )(state)

    # sharded over 8 'atoms' shards
    mesh = make_mesh(n_replica=1, n_atoms_shards=8)
    sstate = shard_state(state, mesh)
    runner = make_sharded_runner(step, mesh, state)
    sh_final, sh_obs = runner(sstate, 20)

    np.testing.assert_allclose(
        np.asarray(sh_final.position), np.asarray(ref_final.position),
        rtol=1e-10, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(sh_obs["cavity_coupling"]),
        np.asarray(ref_obs["cavity_coupling"]), rtol=1e-8, atol=1e-12,
    )


def test_sharded_replica_mesh(system):
    """2x4 (replica x atoms) mesh: the full dp x sp sharding compiles and
    runs; results match the unsharded vmapped run."""
    snap, ff, methods, kT = system
    step = make_step_fn(ff, methods)
    dt = PC.fs_to_atomic_units(0.5)
    batched = init_replica_states(snap, ff, n_replicas=2, dt=dt, seed=3, kT=kT)

    from cavmd_tpu.parallel.replicas import make_replica_step

    vstep = make_replica_step(step)
    ref_final, _ = jax.jit(lambda s: run_steps(vstep, s, 10))(batched)

    mesh = make_mesh(n_replica=2, n_atoms_shards=4)
    sstate = shard_state(batched, mesh, batched=True)
    runner = make_sharded_runner(vstep, mesh, batched, batched=True)
    sh_final, _ = runner(sstate, 10)
    np.testing.assert_allclose(
        np.asarray(sh_final.position), np.asarray(ref_final.position),
        rtol=1e-10, atol=1e-10,
    )


def test_sharded_cell_mode():
    """Cell-mode ForceField under the sharded runner (the large-N config:
    cell pair path + particle-axis sharding)."""
    snap = make_diatomic_system(60, box_L=48.0, temperature_K=100.0, seed=61)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=62
    )
    snap, _ = pad_snapshot_to(snap, 8)
    ff = ForceField.create(
        snap, coupling=1e-3, pair_mode="cell", r_cut=12.0,
        pppm_mesh=(16, 16, 16),
    )
    kT = PC.kT_from_kelvin(100.0)
    methods = resolve_methods(
        snap,
        (
            MethodSpec(kind="bussi", group="molecular", kT=kT,
                       tau=PC.ps_to_atomic_units(5.0)),
            MethodSpec(kind="langevin", group="cavity", kT=kT,
                       gamma=PC.gamma_from_tau_ps(5.0)),
        ),
        ff.l_typeid,
    )
    step = make_step_fn(ff, methods)
    dt = PC.fs_to_atomic_units(0.5)
    state = init_state(snap, ff, dt=dt, seed=3)

    ref_final, _ = jax.jit(lambda s: run_steps(step, s, 10))(state)

    mesh = make_mesh(n_replica=1, n_atoms_shards=8)
    sstate = shard_state(state, mesh)
    runner = make_sharded_runner(step, mesh, state)
    sh_final, _ = runner(sstate, 10)
    np.testing.assert_allclose(
        np.asarray(sh_final.position), np.asarray(ref_final.position),
        rtol=1e-10, atol=1e-10,
    )


def test_ghost_padding_excluded_from_groups():
    """Regression (review finding): padded ghosts must not count toward
    thermostat group DOF or appear in group masks."""
    from cavmd_tpu.integrate.integrator import group_mask

    snap = make_diatomic_system(10, box_L=20.0, seed=71)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=72
    )
    snap, pad = pad_snapshot_to(snap, 8)  # 21 -> 24: 3 ghosts
    assert pad == 3
    ff = ForceField.create(snap, coupling=1e-3, pppm_mesh=(8, 8, 8), r_cut=8.0)
    assert ff.ghost_typeid == snap.types.index("__ghost__")

    methods = resolve_methods(
        snap, (MethodSpec(kind="bussi", group="molecular", kT=1e-4, tau=1.0),),
        ff.l_typeid,
    )
    assert methods[0].dof == 3.0 * 20  # 20 real molecular atoms, not 23

    mask = np.asarray(group_mask(snap.typeid, ff.l_typeid, "molecular",
                                 ff.ghost_typeid))
    assert mask.sum() == 20
    mask_all = np.asarray(group_mask(snap.typeid, ff.l_typeid, "all",
                                     ff.ghost_typeid))
    assert mask_all.sum() == 21  # molecular + photon, no ghosts
