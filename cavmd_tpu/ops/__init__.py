from cavmd_tpu.ops.cavity import CavityParams, cavity_force, cavity_total_energy
from cavmd_tpu.ops.bonds import harmonic_bond_force
from cavmd_tpu.ops.lj import lj_dense, lj_pair_tables, bond_exclusion_mask
from cavmd_tpu.ops.ewald import (
    auto_kappa,
    ewald_real_space,
    ewald_self_energy,
    ewald_exclusion_correction,
    ewald_kspace_exact,
)
from cavmd_tpu.ops.pppm import PPPMParams, pppm_reciprocal_energy, pppm_force_and_energy

__all__ = [
    "CavityParams",
    "cavity_force",
    "cavity_total_energy",
    "harmonic_bond_force",
    "lj_dense",
    "lj_pair_tables",
    "bond_exclusion_mask",
    "auto_kappa",
    "ewald_real_space",
    "ewald_self_energy",
    "ewald_exclusion_correction",
    "ewald_kspace_exact",
    "PPPMParams",
    "pppm_reciprocal_energy",
    "pppm_force_and_energy",
]
