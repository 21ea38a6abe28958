"""ThermodynamicQuantities + reservoir property surface parity tests."""

import numpy as np
import pytest

from cavmd_tpu.core import PhysicalConstants as PC
from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
from cavmd_tpu.integrate import ForceField, MethodSpec
from cavmd_tpu.observe import (
    BussiReservoirView,
    LangevinReservoirView,
    ThermodynamicQuantities,
)
from cavmd_tpu.simulation import Simulation


@pytest.fixture()
def sim():
    snap = make_diatomic_system(10, box_L=20.0, seed=41)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=42
    )
    ff = ForceField.create(snap, coupling=1e-3, pppm_mesh=(8, 8, 8), r_cut=8.0)
    kT = PC.kT_from_kelvin(100.0)
    s = Simulation(
        snap, ff,
        methods=[
            MethodSpec(kind="bussi", group="molecular", kT=kT,
                       tau=PC.ps_to_atomic_units(1.0)),
            MethodSpec(kind="langevin", group="cavity", kT=kT,
                       gamma=PC.gamma_from_tau_ps(1.0)),
        ],
        dt=PC.fs_to_atomic_units(0.5), seed=5, chunk_size=50,
    )
    s.thermalize(kT)
    return s


def test_thermodynamic_quantities(sim):
    mol = ThermodynamicQuantities(sim, "molecular")
    cav = ThermodynamicQuantities(sim, "cavity")
    assert mol.num_particles == 20
    assert cav.num_particles == 1
    assert mol.translational_degrees_of_freedom == 60.0
    assert cav.rotational_degrees_of_freedom == 0.0
    ke = mol.kinetic_energy
    assert ke > 0
    expect_T = 2 * ke / (60.0 * PC.KB_HARTREE_PER_K)
    assert mol.kinetic_temperature == pytest.approx(expect_T)


def test_reservoir_views_and_reset(sim):
    bussi = BussiReservoirView(sim, "molecular")
    lang = LangevinReservoirView(sim, "cavity")
    # zero at start, nonzero after running (parity: test_bussi_reservoir.py)
    assert bussi.total_reservoir_energy == 0.0
    sim.run(n_steps=100)
    assert bussi.reservoir_energy_translational != 0.0
    assert bussi.reservoir_energy_rotational == 0.0
    assert bussi.total_reservoir_energy == bussi.reservoir_energy_translational
    assert bussi.instantaneous_reservoir_total == (
        bussi.instantaneous_reservoir_translational
    )
    assert lang.reservoir_energy != 0.0

    bussi.reset_reservoir_energy()
    assert bussi.total_reservoir_energy == 0.0
    assert bussi.instantaneous_reservoir_total == 0.0
    # resumes accumulating after reset
    sim.run(n_steps=50)
    assert bussi.total_reservoir_energy != 0.0
