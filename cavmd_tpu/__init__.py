"""cavmd_tpu — a TPU-native cavity-QED molecular dynamics framework.

A from-scratch rebuild of the capabilities of the cav-hoomd HOOMD-blue plugin
(reference: muhammadhasyim/cav-hoomd) as a standalone JAX/XLA/Pallas framework.
Instead of an object-oriented C++ engine with per-step host callbacks, the
entire MD step is a pure function ``step(state, ...) -> state`` that XLA fuses
into a single on-device program, wrapped in ``lax.scan`` for inner loops.
Replicas batch over a ``vmap`` axis; large systems shard over a TPU mesh.

Public API parity map (reference file:line cited in each module):

- ``hoomd.cavitymd.CavityForce``        -> :mod:`cavmd_tpu.ops.cavity`
- ``hoomd.bussi_reservoir.BussiReservoir`` -> :mod:`cavmd_tpu.integrate.thermostats`
- ``hoomd.md.bond.Harmonic``            -> :mod:`cavmd_tpu.ops.bonds`
- ``hoomd.md.pair.LJ(mode='shift')``    -> :mod:`cavmd_tpu.ops.lj`
- ``hoomd.md.long_range.pppm``          -> :mod:`cavmd_tpu.ops.pppm` / ``ewald``
- ``hoomd.md.nlist.Cell``               -> :mod:`cavmd_tpu.ops.neighbor`
- ``hoomd.Simulation`` / ``State``      -> :mod:`cavmd_tpu.simulation`
- ``hoomd.custom.Action`` trackers      -> :mod:`cavmd_tpu.observe.trackers`
- GSD read/write                        -> :mod:`cavmd_tpu.io.gsd`
- ``examples/05_advanced_run.py`` CLI   -> :mod:`cavmd_tpu.drivers.advanced_run`
"""

from cavmd_tpu.version import __version__

from cavmd_tpu.core.units import PhysicalConstants
from cavmd_tpu.core.box import Box, unwrap_positions, wrap_positions
from cavmd_tpu.core.snapshot import Snapshot
from cavmd_tpu.core.system import make_diatomic_system

__all__ = [
    "__version__",
    "PhysicalConstants",
    "Box",
    "Snapshot",
    "unwrap_positions",
    "wrap_positions",
    "make_diatomic_system",
]
