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
from cavmd_tpu.ops.lj import LJPairMatrices, fused_pair_force, lj_dense_pair
from cavmd_tpu.ops.neighbor import (
    CellList,
    CellListConfig,
    build_cell_list,
    cell_pair_force,
    exclusion_table,
    make_ewald_cell_kernel,
    make_fused_cell_kernel,
    make_lj_cell_kernel,
    make_particle_features,
    neighbor_cell_table,
    plan_cells,
)
from cavmd_tpu.ops.pallas_kernels import (
    PallasPairPack,
    make_fused_pair_pallas,
    pallas_pair_apply,
)
from cavmd_tpu.ops.bonds import bond_incidence, harmonic_bond_force_incidence
from cavmd_tpu.ops.pppm import PPPMParams, pppm_reciprocal_energy, pppm_force_and_energy

__all__ = [
    "LJPairMatrices", "fused_pair_force", "lj_dense_pair",
    "CellList", "CellListConfig", "build_cell_list", "cell_pair_force",
    "exclusion_table", "make_ewald_cell_kernel", "make_fused_cell_kernel",
    "make_lj_cell_kernel", "make_particle_features", "neighbor_cell_table",
    "plan_cells", "PallasPairPack", "make_fused_pair_pallas",
    "pallas_pair_apply", "bond_incidence", "harmonic_bond_force_incidence",
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
