"""Force correctness: JAX ops vs the independent NumPy oracle (1e-12),
plus conservativity (force == -grad energy) checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavmd_tpu.core import make_diatomic_system, add_cavity_particle
from cavmd_tpu.ops import (
    CavityParams,
    bond_exclusion_mask,
    cavity_force,
    harmonic_bond_force,
    lj_dense,
    lj_pair_tables,
)
from cavmd_tpu.core.system import BOND_PARAMS, LJ_PARAMS

from oracle import oracle_cavity, oracle_harmonic_bonds, oracle_lj_shifted


@pytest.fixture(scope="module")
def cavity_system():
    snap = make_diatomic_system(30, box_L=28.0, temperature_K=100.0, seed=7)
    snap = add_cavity_particle(
        snap, coupling=2e-3, freq_cm1=2000.0, temperature_K=100.0, seed=8
    )
    # give the photon a nonzero position to exercise all force terms
    pos = np.array(snap.position)
    pos[-1] = [0.7, -0.4, 0.9]
    return snap.replace(position=jnp.asarray(pos))


def test_cavity_force_matches_oracle(cavity_system):
    snap = cavity_system
    params = CavityParams.create(omegac=2000.0 / 219474.63, couplstr=2e-3)
    f, e = cavity_force(
        snap.position, snap.image, snap.box_L, snap.charge, snap.typeid,
        snap.type_index("L"), params,
    )
    f_ref, e_ref = oracle_cavity(
        np.asarray(snap.position), np.asarray(snap.image), np.asarray(snap.box_L),
        np.asarray(snap.charge), np.asarray(snap.typeid), 2,
        omegac=2000.0 / 219474.63, couplstr=2e-3,
    )
    np.testing.assert_allclose(np.asarray(f), f_ref, atol=1e-14, rtol=1e-12)
    for key in ("harmonic", "coupling", "dipole_self"):
        assert float(e[key]) == pytest.approx(e_ref[key], rel=1e-12, abs=1e-15)


def test_cavity_force_is_gradient(cavity_system):
    """The cavity force must be the exact -grad of the total cavity energy
    (including the z-zeroing conventions — the energy depends only on xy of
    the dipole, so -grad reproduces the zeroed molecular z forces)."""
    snap = cavity_system
    params = CavityParams.create(omegac=2000.0 / 219474.63, couplstr=2e-3)

    def total_energy(pos):
        _, e = cavity_force(
            pos, snap.image, snap.box_L, snap.charge, snap.typeid,
            snap.type_index("L"), params,
        )
        return e["harmonic"] + e["coupling"] + e["dipole_self"]

    g = jax.grad(total_energy)(snap.position)
    f, _ = cavity_force(
        snap.position, snap.image, snap.box_L, snap.charge, snap.typeid,
        snap.type_index("L"), params,
    )
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), atol=1e-13)


def test_cavity_no_photon_zero(cavity_system):
    snap = make_diatomic_system(10, box_L=20.0, seed=3)
    params = CavityParams.create(omegac=0.01, couplstr=1e-3)
    f, e = cavity_force(
        snap.position, snap.image, snap.box_L, snap.charge, snap.typeid,
        2, params,
    )
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=0)
    assert float(e["harmonic"]) == 0.0


def test_harmonic_bonds_match_oracle():
    snap = make_diatomic_system(40, box_L=30.0, seed=11)
    k = jnp.asarray([BOND_PARAMS["O-O"]["k"], BOND_PARAMS["N-N"]["k"]])
    r0 = jnp.asarray([BOND_PARAMS["O-O"]["r0"], BOND_PARAMS["N-N"]["r0"]])
    # perturb positions so bonds are strained
    rng = np.random.default_rng(0)
    pos = np.asarray(snap.position) + rng.normal(scale=0.1, size=(snap.N, 3))
    f, e = harmonic_bond_force(
        jnp.asarray(pos), snap.box_L, snap.bond_group, snap.bond_typeid, k, r0
    )
    f_ref, e_ref = oracle_harmonic_bonds(
        pos, np.asarray(snap.box_L), np.asarray(snap.bond_group),
        np.asarray(snap.bond_typeid), np.asarray(k), np.asarray(r0),
    )
    np.testing.assert_allclose(np.asarray(f), f_ref, atol=1e-12)
    assert float(e) == pytest.approx(e_ref, rel=1e-12)


def test_harmonic_bonds_are_gradient():
    snap = make_diatomic_system(10, box_L=20.0, seed=5)
    k = jnp.asarray([0.7, 1.4])
    r0 = jnp.asarray([2.3, 2.1])
    rng = np.random.default_rng(1)
    pos = jnp.asarray(np.asarray(snap.position) + rng.normal(scale=0.05, size=(snap.N, 3)))

    def energy(p):
        return harmonic_bond_force(
            p, snap.box_L, snap.bond_group, snap.bond_typeid, k, r0
        )[1]

    g = jax.grad(energy)(pos)
    f, _ = harmonic_bond_force(
        pos, snap.box_L, snap.bond_group, snap.bond_typeid, k, r0
    )
    np.testing.assert_allclose(np.asarray(f), -np.asarray(g), atol=1e-12)


def test_lj_matches_oracle():
    snap = make_diatomic_system(30, box_L=26.0, seed=13)
    eps, sig, rcut = lj_pair_tables(["O", "N"], {
        k: dict(**v, r_cut=12.0) for k, v in LJ_PARAMS.items()
    })
    excl = bond_exclusion_mask(snap.N, snap.bond_group)
    f, e = lj_dense(
        snap.position, snap.box_L, snap.typeid, eps, sig, rcut, excl
    )
    f_ref, e_ref = oracle_lj_shifted(
        np.asarray(snap.position), np.asarray(snap.box_L), np.asarray(snap.typeid),
        np.asarray(eps), np.asarray(sig), np.asarray(rcut),
        excluded_pairs=[tuple(b) for b in np.asarray(snap.bond_group)],
    )
    np.testing.assert_allclose(np.asarray(f), f_ref, atol=1e-12, rtol=1e-10)
    assert float(e) == pytest.approx(e_ref, rel=1e-10, abs=1e-14)


def test_lj_photon_inert():
    """Zeroed ('L', *) rows disable photon pair interactions
    (05_advanced_run.py:584-595 semantics via epsilon=0/r_cut=0 defaults)."""
    snap = make_diatomic_system(10, box_L=20.0, seed=17)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=18
    )
    eps, sig, rcut = lj_pair_tables(["O", "N", "L"], {
        k: dict(**v, r_cut=10.0) for k, v in LJ_PARAMS.items()
    })
    excl = bond_exclusion_mask(snap.N, snap.bond_group)
    f, _ = lj_dense(snap.position, snap.box_L, snap.typeid, eps, sig, rcut, excl)
    np.testing.assert_allclose(np.asarray(f)[-1], 0.0, atol=1e-14)


def test_lj_energy_shift_continuity():
    """V(r_cut^-) -> 0 under shift mode."""
    eps, sig, rcut = lj_pair_tables(["A"], {("A", "A"): dict(epsilon=1.0, sigma=1.0, r_cut=2.5)})
    box = jnp.asarray([100.0, 100.0, 100.0])
    pos = jnp.asarray([[0.0, 0.0, 0.0], [2.4999999, 0.0, 0.0]])
    _, e = lj_dense(pos, box, jnp.zeros(2, jnp.int32), eps, sig, rcut)
    assert abs(float(e)) < 1e-5


def test_custom_force_hook():
    """User custom forces (hoomd.md.force.Custom parity) fuse into the step
    and join the energy audit."""
    from cavmd_tpu.integrate import ForceField, MethodSpec, init_state, \
        make_step_fn, resolve_methods, run_steps, potential_energy, universe_energy
    from cavmd_tpu.core import PhysicalConstants as PC

    snap = make_diatomic_system(8, box_L=18.0, temperature_K=50.0, seed=71)

    def harmonic_trap(position, image, box_L, charge, typeid):
        k = 1e-4
        e = 0.5 * k * jnp.sum(position ** 2)
        return -k * position, e

    ff = ForceField.create(
        snap, enable_cavity=False, enable_coulomb=False,
        custom_forces=(harmonic_trap,),
    )
    args = (snap.position, snap.image, snap.box_L, snap.charge, snap.typeid,
            snap.bond_group, snap.bond_typeid)
    f, e = ff.compute(*args)
    assert "custom_0" in e and float(e["custom_0"]) > 0

    # NVE with the trap still conserves energy (custom PE in the audit)
    methods = resolve_methods(snap, (MethodSpec(kind="nve", group="all"),), -1)
    step = jax.jit(make_step_fn(ff, methods))
    state = init_state(snap, ff, dt=PC.fs_to_atomic_units(0.25), seed=1)
    final, obs = run_steps(step, state, 300)
    E = np.asarray(
        potential_energy(obs) + obs["kinetic_molecular"] + obs["kinetic_cavity"]
    )
    assert np.abs(E - E[0]).max() < 5e-6
