from cavmd_tpu.core.units import PhysicalConstants
from cavmd_tpu.core.box import (
    Box,
    unwrap_positions,
    wrap_positions,
    rewrap,
    minimum_image,
)
from cavmd_tpu.core.snapshot import Snapshot, add_cavity_particle
from cavmd_tpu.core.system import make_diatomic_system

__all__ = [
    "PhysicalConstants",
    "Box",
    "unwrap_positions",
    "wrap_positions",
    "rewrap",
    "minimum_image",
    "Snapshot",
    "add_cavity_particle",
    "make_diatomic_system",
]
