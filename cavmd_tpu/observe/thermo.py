"""Group thermodynamic quantities + thermostat reservoir introspection.

Rebuilds ``hoomd.md.compute.ThermodynamicQuantities`` (consumed surface,
reference 05_advanced_run.py:890-903) and the ``BussiReservoir`` logging
property surface (src/bussi_reservoir/thermostats.py:95-158): six reservoir
energies (cumulative + instantaneous, translational/rotational/total) and
``reset_reservoir_energy``.
"""

from __future__ import annotations

import numpy as np

from cavmd_tpu.core.units import PhysicalConstants


class ThermodynamicQuantities:
    """Kinetic energy / temperature / DOF of a typed particle group,
    evaluated from a Simulation's current state."""

    def __init__(self, simulation, group: str):
        self.sim = simulation
        self.group = group

    def _mask(self):
        typeid = np.asarray(self.sim.state.typeid)
        l_typeid = self.sim.ff.l_typeid
        ghost = getattr(self.sim.ff, "ghost_typeid", -1)
        not_ghost = typeid != ghost if ghost >= 0 else np.ones_like(typeid, bool)
        if self.group == "molecular":
            return (typeid != l_typeid) & not_ghost
        if self.group == "cavity":
            return typeid == l_typeid
        return not_ghost

    @property
    def num_particles(self) -> int:
        return int(self._mask().sum())

    @property
    def translational_degrees_of_freedom(self) -> float:
        return 3.0 * self.num_particles

    @property
    def rotational_degrees_of_freedom(self) -> float:
        return 0.0  # point particles

    @property
    def kinetic_energy(self) -> float:
        mask = self._mask()
        v = np.asarray(self.sim.state.velocity)[mask]
        m = np.asarray(self.sim.state.mass)[mask]
        return float(0.5 * np.sum(m[:, None] * v * v))

    translational_kinetic_energy = kinetic_energy

    @property
    def rotational_kinetic_energy(self) -> float:
        return 0.0

    @property
    def kinetic_temperature(self) -> float:
        dof = self.translational_degrees_of_freedom
        if dof == 0:
            return 0.0
        return 2.0 * self.kinetic_energy / (
            dof * PhysicalConstants.KB_HARTREE_PER_K
        )


class BussiReservoirView:
    """The BussiReservoir thermostat's logged-property surface for one
    group slot (parity: thermostats.py:95-158). Point particles have no
    rotational DOF, so rotational entries are zero but present."""

    def __init__(self, simulation, group: str):
        from cavmd_tpu.integrate.integrator import group_slot

        self.sim = simulation
        self.slot = group_slot(group)

    @property
    def reservoir_energy_translational(self) -> float:
        return float(self.sim.state.bussi_reservoir[self.slot])

    @property
    def reservoir_energy_rotational(self) -> float:
        return float(self.sim.state.bussi_reservoir_rot[self.slot])

    @property
    def total_reservoir_energy(self) -> float:
        return self.reservoir_energy_translational + self.reservoir_energy_rotational

    @property
    def instantaneous_reservoir_translational(self) -> float:
        return float(self.sim.state.bussi_instantaneous[self.slot])

    @property
    def instantaneous_reservoir_rotational(self) -> float:
        return 0.0

    @property
    def instantaneous_reservoir_total(self) -> float:
        return self.instantaneous_reservoir_translational

    def reset_reservoir_energy(self):
        s = self.sim.state
        self.sim.state = s.replace(
            bussi_reservoir=s.bussi_reservoir.at[self.slot].set(0.0),
            bussi_reservoir_rot=s.bussi_reservoir_rot.at[self.slot].set(0.0),
            bussi_instantaneous=s.bussi_instantaneous.at[self.slot].set(0.0),
        )


class LangevinReservoirView:
    """Langevin ``reservoir_energy`` property (parity:
    ``hoomd.md.methods.Langevin.reservoir_energy`` with tally enabled)."""

    def __init__(self, simulation, group: str):
        from cavmd_tpu.integrate.integrator import group_slot

        self.sim = simulation
        self.slot = group_slot(group)

    @property
    def reservoir_energy(self) -> float:
        return float(self.sim.state.langevin_reservoir[self.slot])
