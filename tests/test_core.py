"""Tests for units, box, snapshot, system generator."""

import jax.numpy as jnp
import numpy as np
import pytest

from cavmd_tpu.core import (
    Box,
    PhysicalConstants,
    Snapshot,
    add_cavity_particle,
    make_diatomic_system,
    minimum_image,
    unwrap_positions,
    wrap_positions,
)


def test_unit_roundtrip():
    assert PhysicalConstants.atomic_units_to_ps(
        PhysicalConstants.ps_to_atomic_units(3.7)
    ) == pytest.approx(3.7, rel=1e-15)
    # reference values (src/cavitymd/utils.py:12-18)
    assert PhysicalConstants.HARTREE_TO_CM_MINUS1 == 219474.63
    assert PhysicalConstants.KB_HARTREE_PER_K == 3.167e-6
    assert PhysicalConstants.TIME_PS_CONVERSION == 2.418884e-5


def test_gamma_from_tau():
    gamma = PhysicalConstants.gamma_from_tau_ps(5.0)
    tau_au = PhysicalConstants.ps_to_atomic_units(5.0)
    assert gamma == pytest.approx(1.0 / tau_au, rel=1e-15)
    with pytest.raises(ValueError):
        PhysicalConstants.gamma_from_tau_ps(0.0)


def test_wrap_unwrap_roundtrip():
    rng = np.random.default_rng(0)
    box_L = np.array([10.0, 12.0, 14.0])
    pos = rng.uniform(-40, 40, size=(50, 3))
    wrapped, image = wrap_positions(pos, box_L)
    wrapped = np.asarray(wrapped)
    assert np.all(wrapped >= -box_L / 2 - 1e-12)
    assert np.all(wrapped < box_L / 2 + 1e-12)
    np.testing.assert_allclose(
        np.asarray(unwrap_positions(wrapped, image, box_L)), pos, atol=1e-12
    )


def test_minimum_image():
    box_L = np.array([10.0, 10.0, 10.0])
    dr = np.array([[6.0, -6.0, 4.9]])
    out = np.asarray(minimum_image(dr, box_L))
    np.testing.assert_allclose(out, [[-4.0, 4.0, 4.9]], atol=1e-12)


def test_diatomic_system_properties():
    snap = make_diatomic_system(50, box_L=30.0, temperature_K=100.0, seed=1)
    assert snap.N == 100
    assert snap.n_bonds == 50
    assert snap.types == ("O", "N")
    # net charge zero, per-molecule net charge zero
    assert float(jnp.sum(snap.charge)) == pytest.approx(0.0, abs=1e-12)
    # bond lengths near rest lengths
    pos = np.asarray(snap.position)
    img = np.asarray(snap.image)
    box = np.asarray(snap.box_L)
    unwrapped = pos + img * box
    bg = np.asarray(snap.bond_group)
    lengths = np.linalg.norm(
        np.asarray(minimum_image(pos[bg[:, 1]] - pos[bg[:, 0]], box)), axis=1
    )
    assert np.all(lengths > 1.5) and np.all(lengths < 3.0)
    # masses positive and species-dependent
    assert np.asarray(snap.mass).min() > 1000.0


def test_add_cavity_particle_q0():
    snap = make_diatomic_system(20, box_L=25.0, seed=2)
    out = add_cavity_particle(
        snap, coupling=0.0, freq_cm1=2000.0, temperature_K=100.0, seed=3
    )
    assert out.N == snap.N + 1
    assert out.types == ("O", "N", "L")
    # zero coupling -> photon exactly at origin (05_advanced_run.py:477-484)
    np.testing.assert_allclose(np.asarray(out.position)[-1], 0.0, atol=1e-14)
    assert float(out.charge[-1]) == 0.0
    assert float(out.mass[-1]) == 1.0
    assert int(out.typeid[-1]) == 2


def test_add_cavity_particle_finite_q():
    snap = make_diatomic_system(20, box_L=25.0, seed=2)
    out = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0,
        finite_q=True, seed=3,
    )
    # finite-q: photon displaced from origin; z-free equilibrium + noise
    p = np.asarray(unwrap_positions(out.position[-1:], out.image[-1:], out.box_L))[0]
    assert np.linalg.norm(p) > 0.0


def test_snapshot_pytree():
    import jax

    snap = make_diatomic_system(5, box_L=20.0)
    leaves = jax.tree_util.tree_leaves(snap)
    assert all(hasattr(l, "shape") for l in leaves)
    snap2 = jax.tree_util.tree_map(lambda x: x, snap)
    assert snap2.types == snap.types
