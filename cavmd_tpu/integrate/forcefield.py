"""ForceField: one container that evaluates every force in a single fused pass.

The TPU inversion of HOOMD's per-force ``computeForces`` callback chain
(SURVEY.md §3.2): instead of the integrator looping over force objects with
host orchestration between them, ``ForceField.compute`` evaluates cavity +
bonds + LJ + Ewald short + PPPM long in one traced function; XLA fuses the
elementwise work and shares the pair-distance computation. Energy components
come back as a dict matching the reference EnergyTracker's column names
(src/cavitymd/analysis.py:661-671).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cavmd_tpu.core.snapshot import Snapshot
from cavmd_tpu.ops.bonds import (
    bond_incidence,
    bonds_are_consecutive,
    harmonic_bond_force,
    harmonic_bond_force_incidence,
    harmonic_bond_force_strided,
)
from cavmd_tpu.ops.cavity import CavityParams, cavity_force
from cavmd_tpu.ops.ewald import (
    auto_kappa,
    auto_kappa_error_estimate,
    ewald_exclusion_correction,
    ewald_exclusion_correction_incidence,
    ewald_exclusion_correction_strided,
    ewald_real_space_pair,
    ewald_self_energy,
)
from cavmd_tpu.ops.lj import (
    LJPairMatrices,
    bond_exclusion_mask,
    lj_dense_pair,
    lj_pair_tables,
)
from cavmd_tpu.ops.neighbor import (
    build_cell_list,
    cell_pair_force,
    exclusion_table,
    make_ewald_cell_kernel,
    make_lj_cell_kernel,
    make_particle_features,
    neighbor_cell_table,
    plan_cells,
)
from cavmd_tpu.ops.pppm import PPPMParams, make_pppm_force_energy


@dataclasses.dataclass(frozen=True)
class ForceField:
    """All force parameters (pytree) + static switches (aux data)."""

    # bonds
    bond_k: jnp.ndarray  # (n_bond_types,)
    bond_r0: jnp.ndarray
    # LJ — precomputed per-pair matrices (zero gathers in the hot path)
    lj_pair: LJPairMatrices
    excl_mask: jnp.ndarray  # (N,N) bool — bonded-pair exclusions (dense path)
    # cavity
    cavity: CavityParams
    # electrostatics — static active mask; qq is formed on the fly from the
    # charge vector (rank-1, fuses into the pair loop — no (N,N) HBM reads)
    coulomb_active: jnp.ndarray  # (N,N) bool
    kappa: jnp.ndarray
    pppm: PPPMParams
    # bond incidence matmul path (small systems; None -> scatter path)
    bond_gi: jnp.ndarray = None  # (Nb, N) endpoint selectors
    bond_gj: jnp.ndarray = None
    bond_k_per: jnp.ndarray = None  # (Nb,) per-bond parameters
    bond_r0_per: jnp.ndarray = None
    # cell-list backend data (None-shaped placeholders in dense mode)
    lj_eps: jnp.ndarray = None  # (T,T) type tables for the cell kernels
    lj_sigma: jnp.ndarray = None
    lj_rcut: jnp.ndarray = None
    cell_features: jnp.ndarray = None  # (N+1, T+1)
    cell_exclusions: jnp.ndarray = None  # (N+1, max_excl) int32
    cell_neighbors: jnp.ndarray = None  # (C, 27) int32
    # pallas backend data
    pallas_pack: object = None  # PallasPairPack when pair_mode == 'pallas'
    # fused cell kernel data (cell mode, uniform cutoff): when present and
    # running f32 on a TPU backend, the tile pass runs in the Pallas cell
    # kernel (2.7-3x the XLA tile path at N=100k, measured v5e)
    cell_pallas_pack: object = None
    # static
    l_typeid: int = 2
    coulomb_rcut: float = 15.0
    pppm_order: int = 6
    pppm_mesh: Tuple[int, int, int] = (32, 32, 32)
    enable_cavity: bool = True
    enable_coulomb: bool = True
    enable_lj: bool = True
    enable_bonds: bool = True
    pair_mode: str = "dense"  # 'dense' (all-pairs) | 'cell' (large N)
    cell_cfg: tuple = None  # CellListConfig when pair_mode == 'cell'
    cell_block: int = None  # cells per lax.map block (bounds tile memory)
    n_types: int = 0
    # user extension point (parity: hoomd.md.force.Custom — consumed
    # surface, SURVEY.md §2.3): traced callables
    # (position, image, box_L, charge, typeid) -> (forces, energy),
    # fused into the same step; energies land in 'custom_<i>' keys
    custom_forces: tuple = ()
    # uniform cutoff of all enabled type pairs (None if they differ) —
    # enables the reduced-traffic fused cell kernel
    uniform_rcut: float = None
    ghost_typeid: int = -1  # typeid of sharding-padding ghosts ('__ghost__')
    # (N,) bool: particles inert to the pair pass (no LJ, no charge) — the
    # photon and sharding ghosts. Excluded from the cell-rebuild
    # displacement trigger: the light photon (mass 1 vs ~25k) moves ~0.3
    # bohr/step and would force a rebuild every step (measured) despite
    # contributing nothing to any pair tile.
    pair_inert: jnp.ndarray = None
    # consecutive-pair bond topology (bond b = particles (2b, 2b+1)) —
    # enables the reshape-strided bond/exclusion paths (ops/bonds.py)
    bonds_strided: bool = False
    n_bonds: int = 0
    # zcol kernel static visit window (blocks per i-block): planned at
    # create time so overflow recovery can GROW it — doubling the bucket
    # cap alone cannot widen a too-narrow hull window
    zcol_W: int = None

    def build_cells(self, position, box_L):
        """Bin particles into cell buckets (cell mode only) — exposed so the
        integrator can carry the CellList across steps and rebuild it only
        when a particle has moved more than skin/2 (the HOOMD
        displacement-triggered rebuild with ``buffer``, SURVEY.md §2.3)."""
        from cavmd_tpu.ops.neighbor import CellListConfig, build_zcol_list

        cfg = CellListConfig(*self.cell_cfg)
        if self.pair_mode == "zcol":
            return build_zcol_list(position, box_L, cfg)
        return build_cell_list(position, box_L, cfg, self.cell_neighbors)

    def compute(self, position, image, box_L, charge, typeid, bond_group,
                bond_typeid, clist=None):
        """Total forces + component energies in one fused evaluation.

        Returns (forces (N,3), energies dict). Energy keys mirror the
        reference energy audit: harmonic (bonds), lj, ewald_short,
        ewald_long, cavity_harmonic, cavity_coupling, cavity_dipole_self.

        ``clist``: optional externally-carried CellList (cell mode). When
        None, buckets are rebuilt from the current positions.
        """
        dtype = position.dtype
        zero = jnp.zeros((), dtype)
        forces = jnp.zeros_like(position)
        energies = {
            "harmonic": zero,
            "lj": zero,
            "ewald_short": zero,
            "ewald_long": zero,
            "cavity_harmonic": zero,
            "cavity_coupling": zero,
            "cavity_dipole_self": zero,
        }

        if self.enable_bonds:
            if self.bonds_strided:
                f, e = harmonic_bond_force_strided(
                    position, box_L, self.n_bonds,
                    self.bond_k_per, self.bond_r0_per,
                )
            elif self.bond_gi is not None:
                f, e = harmonic_bond_force_incidence(
                    position, box_L, self.bond_gi, self.bond_gj,
                    self.bond_k_per, self.bond_r0_per,
                )
            else:
                f, e = harmonic_bond_force(
                    position, box_L, bond_group, bond_typeid,
                    self.bond_k, self.bond_r0,
                )
            forces = forces + f
            energies["harmonic"] = e

        if (self.pair_mode in ("cell", "zcol")
                and (self.enable_lj or self.enable_coulomb)):
            from cavmd_tpu.ops.neighbor import CellListConfig

            cfg = CellListConfig(*self.cell_cfg)
            if clist is None:
                clist = self.build_cells(position, box_L)
            # failure detection (SURVEY.md §5): a bucket overflow would
            # silently drop pairs — surface it in the observable stream so
            # the chunked runner can abort (Simulation.run checks it)
            energies["cell_overflow"] = clist.overflow.astype(dtype)
            common = dict(
                features=self.cell_features,
                exclusions=self.cell_exclusions,
                cell_block=self.cell_block,
            )
            use_pallas_cells = (
                self.cell_pallas_pack is not None
                and self.enable_lj and self.enable_coulomb
                and dtype == jnp.float32
                and jax.default_backend() == "tpu"
            )
            if self.pair_mode == "zcol":
                # z-sorted column layout: Pallas-only (the merged-halo
                # window pruning has no XLA tile counterpart). Off-TPU it
                # runs the same kernel in interpret mode — correct, slow;
                # auto-selection never picks zcol off-TPU.
                from cavmd_tpu.ops.pallas_kernels import (
                    fused_zsort_cols_pallas,
                )

                f, e_lj, e_ew, win_ovf = fused_zsort_cols_pallas(
                    position, box_L, clist, cfg, self.cell_pallas_pack,
                    self.kappa, W=self.zcol_W,
                    interpret=jax.default_backend() != "tpu",
                )
                forces = forces + f
                energies["lj"] = e_lj
                energies["ewald_short"] = e_ew
                # a hull wider than the kernel's static window would drop
                # pair blocks — same failure class as a bucket overflow,
                # same detection channel
                energies["cell_overflow"] = jnp.maximum(
                    energies["cell_overflow"], win_ovf.astype(dtype)
                )
            elif use_pallas_cells:
                # hand-fused Pallas tile pass: all intermediates in VMEM
                # (the XLA tile path materializes several (C, cap, 27cap)
                # tensors to HBM; measured 2.7-3x slower at N=100k).
                # Column-resident variant when the cell grid allows it —
                # kills the (C,27,cap,R) j-gather+transpose (9-10 ms/step
                # at N=100k, measured; see fused_cell_cols_pallas)
                from cavmd_tpu.ops.pallas_kernels import (
                    fused_cell_cols_pallas,
                    fused_cell_pallas,
                )

                cell_fn = (
                    fused_cell_cols_pallas
                    if min(cfg.ncells) >= 3 else fused_cell_pallas
                )
                f, e_lj, e_ew = cell_fn(
                    position, box_L, clist, cfg, self.cell_pallas_pack,
                    self.kappa,
                )
                forces = forces + f
                energies["lj"] = e_lj
                energies["ewald_short"] = e_ew
            elif self.enable_lj and self.enable_coulomb:
                # fused tile pass: one shared distance computation
                from cavmd_tpu.ops.neighbor import make_fused_cell_kernel

                kern = make_fused_cell_kernel(
                    self.lj_eps, self.lj_sigma, self.lj_rcut, self.kappa,
                    self.n_types, uniform_rcut=self.uniform_rcut,
                )
                f, (e_lj, e_ew) = cell_pair_force(
                    position, box_L, clist, cfg, kern, **common
                )
                forces = forces + f
                energies["lj"] = e_lj
                energies["ewald_short"] = e_ew
            elif self.enable_lj:
                kern = make_lj_cell_kernel(
                    self.lj_eps, self.lj_sigma, self.lj_rcut, self.n_types
                )
                f, e = cell_pair_force(
                    position, box_L, clist, cfg, kern, **common
                )
                forces = forces + f
                energies["lj"] = e
            elif self.enable_coulomb:
                kern = make_ewald_cell_kernel(self.kappa, self.n_types)
                f, e = cell_pair_force(
                    position, box_L, clist, cfg, kern, **common
                )
                forces = forces + f
                energies["ewald_short"] = e
        elif (
            self.pair_mode == "pallas"
            and self.enable_lj and self.enable_coulomb
        ):
            # hand-written Pallas kernel backend (f32; matches the jnp
            # fused path — XLA's fusion is already at roofline at small N,
            # so this is an opt-in, not the default)
            from cavmd_tpu.ops.pallas_kernels import pallas_pair_apply

            f, e_lj, e_ew = pallas_pair_apply(
                position, box_L, self.pallas_pack, self.kappa,
                self.coulomb_rcut,
            )
            forces = forces + f
            energies["lj"] = e_lj
            energies["ewald_short"] = e_ew
        elif self.enable_lj and self.enable_coulomb:
            # fused pass: one shared (N,N) distance computation
            from cavmd_tpu.ops.lj import fused_pair_force

            qq = charge[..., :, None] * charge[..., None, :]
            f, e_lj, e_ew = fused_pair_force(
                position, box_L, self.lj_pair, qq,
                self.coulomb_active, self.kappa, self.coulomb_rcut,
            )
            forces = forces + f
            energies["lj"] = e_lj
            energies["ewald_short"] = e_ew
        else:
            if self.enable_lj:
                f, e = lj_dense_pair(position, box_L, self.lj_pair)
                forces = forces + f
                energies["lj"] = e

            if self.enable_coulomb:
                qq = charge[..., :, None] * charge[..., None, :]
                f, e = ewald_real_space_pair(
                    position, box_L, qq, self.coulomb_active,
                    self.kappa, self.coulomb_rcut,
                )
                forces = forces + f
                energies["ewald_short"] = e

        if self.enable_coulomb:
            # vmap-aware op: under the replica-batched step the custom_vmap
            # rule folds the batch into the DFT matmul columns instead of
            # letting vmap shred them into B tiny matmuls (VERDICT r1 #4)
            pppm_fe = make_pppm_force_energy(
                self.pppm_order, tuple(self.pppm_mesh)
            )
            f_rec, e_rec = pppm_fe(position, charge, box_L, self.pppm)
            if self.bonds_strided:
                f_corr, e_corr = ewald_exclusion_correction_strided(
                    position, box_L, charge, self.kappa, self.n_bonds,
                )
            elif self.bond_gi is not None:
                f_corr, e_corr = ewald_exclusion_correction_incidence(
                    position, box_L, self.bond_gi, self.bond_gj,
                    charge, self.kappa,
                )
            else:
                f_corr, e_corr = ewald_exclusion_correction(
                    position, box_L, charge, self.kappa, bond_group
                )
            e_self = ewald_self_energy(charge, self.kappa)
            forces = forces + f_rec - f_corr
            energies["ewald_long"] = e_rec - e_self - e_corr

        for i, custom in enumerate(self.custom_forces):
            f, e = custom(position, image, box_L, charge, typeid)
            forces = forces + f
            energies[f"custom_{i}"] = e

        if self.enable_cavity:
            f, e = cavity_force(
                position, image, box_L, charge, typeid, self.l_typeid, self.cavity
            )
            forces = forces + f
            energies["cavity_harmonic"] = e["harmonic"]
            energies["cavity_coupling"] = e["coupling"]
            energies["cavity_dipole_self"] = e["dipole_self"]

        return forces, energies

    @staticmethod
    def create(
        snapshot: Snapshot,
        *,
        coupling: float = 1e-3,
        freq_cm1: float = 2000.0,
        phmass: float = 1.0,
        enable_cavity: bool = True,
        enable_coulomb: bool = True,
        enable_lj: bool = True,
        enable_bonds: bool = True,
        lj_params: dict | None = None,
        bond_params: dict | None = None,
        r_cut: float = 15.0,
        pppm_mesh: Tuple[int, int, int] = (32, 32, 32),
        pppm_order: int = 6,
        kappa: float | None = None,
        ewald_accuracy: float = 1e-6,
        kappa_mode: str = "erfc",  # 'erfc' (bisection on erfc(k rc)) or
        # 'kolafa-perram' (system-aware RMS-error root-find — the HOOMD
        # alpha=0 auto-tune family, ref 05_advanced_run.py:601-603)
        pair_mode: str | None = None,
        custom_forces: tuple = (),
        cell_skin: float = 0.5,  # minimum Verlet skin (snapped up to the
        # free cell-width slack, see plan_cells); the integrator carries the
        # CellList and rebuilds only on >skin/2 displacement. 0 = legacy
        # per-step rebuild (costs ~19 ms/step argsort at N=100k, measured)
        cell_cap: int | None = None,
        dtype=None,
    ) -> "ForceField":
        """Build the reference workflow's force mix for a snapshot.

        Defaults reproduce ``examples/05_advanced_run.py:556-608``: cavity
        force (omega_c from cm^-1), O-O/N-N harmonic bonds, shifted LJ with
        r_cut 15 and photon-inert 'L' rows, PPPM 32^3 order 6.
        """
        from cavmd_tpu.core.system import BOND_PARAMS, LJ_PARAMS
        from cavmd_tpu.core.units import PhysicalConstants

        dtype = dtype or snapshot.position.dtype
        lj_params = lj_params if lj_params is not None else LJ_PARAMS
        bond_params = bond_params if bond_params is not None else BOND_PARAMS

        bond_types = snapshot.bond_types or tuple(bond_params.keys())
        bond_k = jnp.asarray([bond_params[t]["k"] for t in bond_types], dtype)
        bond_r0 = jnp.asarray([bond_params[t]["r0"] for t in bond_types], dtype)

        # bond-path selection (see bonds.py notes): consecutive-pair
        # topology -> reshape-strided (zero gathers, any size); else
        # incidence matmuls for small systems; else the scatter fallback
        nb = snapshot.n_bonds
        bond_gi = bond_gj = bond_k_per = bond_r0_per = None
        bonds_strided = bonds_are_consecutive(snapshot.bond_group)
        if nb > 0:
            btid = np.asarray(snapshot.bond_typeid)
            bond_k_per = jnp.asarray(np.asarray(bond_k)[btid], dtype)
            bond_r0_per = jnp.asarray(np.asarray(bond_r0)[btid], dtype)
        if not bonds_strided and 0 < nb * snapshot.N <= 8_000_000:
            bond_gi, bond_gj = bond_incidence(
                snapshot.N, snapshot.bond_group, dtype
            )

        types = list(snapshot.types)
        eps, sig, rcut_t = lj_pair_tables(
            types,
            {k: {**v, "r_cut": v.get("r_cut", r_cut)} for k, v in lj_params.items()},
            dtype=dtype,
        )
        # pick the pair backend: dense all-pairs is faster below a few
        # thousand particles; the cell path avoids O(N^2) memory above
        if pair_mode is None:
            pair_mode = "dense" if snapshot.N <= 4096 else "cell"
        dense_like = pair_mode in ("dense", "pallas")

        lj_pair = excl = coulomb_active_jnp = None
        cell_fields = dict(
            lj_eps=eps, lj_sigma=sig, lj_rcut=rcut_t,
            cell_features=None, cell_exclusions=None, cell_neighbors=None,
            pair_inert=None, cell_pallas_pack=None,
        )
        cell_cfg_tuple = None
        if dense_like:
            excl = bond_exclusion_mask(snapshot.N, snapshot.bond_group)
            lj_pair = LJPairMatrices.create(
                snapshot.typeid, eps, sig, rcut_t, excl
            )
            charge_np = np.asarray(snapshot.charge)
            qq = charge_np[:, None] * charge_np[None, :]
            coulomb_active = (
                (~np.eye(snapshot.N, dtype=bool)) & (qq != 0) & ~np.asarray(excl)
            )
            coulomb_active_jnp = jnp.asarray(coulomb_active)
        pallas_pack = None
        if pair_mode == "pallas":
            from cavmd_tpu.ops.pallas_kernels import PallasPairPack

            pallas_pack = PallasPairPack.create(
                lj_pair, qq, coulomb_active, snapshot.N
            )
        # uniform-cutoff detection for the reduced-traffic cell kernel
        eps_np = np.asarray(eps)
        rc_np = np.asarray(rcut_t)
        enabled = eps_np != 0
        uniform_rcut_val = None
        if enabled.any():
            vals = np.unique(rc_np[enabled])
            if len(vals) == 1:
                uniform_rcut_val = float(vals[0])

        cell_block_val = None
        if pair_mode in ("cell", "zcol"):
            if pair_mode == "zcol":
                # z-sorted column layout (Pallas merged-halo kernel):
                # requires the fused-kernel preconditions
                if uniform_rcut_val is None or not (
                    enable_lj and enable_coulomb
                ):
                    raise ValueError(
                        "pair_mode='zcol' needs a uniform cutoff with both "
                        "LJ and Coulomb enabled (the fused kernel's "
                        "contract); use pair_mode='cell'"
                    )
                from cavmd_tpu.ops.neighbor import plan_zcolumns

                cfg = plan_zcolumns(
                    np.asarray(snapshot.box_L), r_cut, skin=cell_skin,
                    n=snapshot.N,
                )
                if min(cfg.ncells[:2]) < 3:
                    raise ValueError(
                        "pair_mode='zcol' needs >=3 columns per xy axis "
                        f"(got {cfg.ncells[:2]}); use pair_mode='cell'"
                    )
                if cell_cap is not None:
                    # column capacity must stay a j-block multiple
                    cfg = cfg._replace(cap=((cell_cap + 127) // 128) * 128)
                from cavmd_tpu.ops.pallas_kernels import plan_zcol_window

                cell_fields["zcol_W"] = plan_zcol_window(
                    snapshot.N, cfg.ncells[0] * cfg.ncells[1],
                    cfg.ncells[:2],
                )
            else:
                cfg = plan_cells(
                    np.asarray(snapshot.box_L), r_cut, skin=cell_skin,
                    n=snapshot.N, cap=cell_cap,
                )
            cell_cfg_tuple = tuple(cfg)
            # bound peak tile memory (~256 MB of f32 per materialized tile)
            tile_bytes_per_cell = cfg.cap * 27 * cfg.cap * 4
            max_block = max(1, (256 << 20) // max(tile_bytes_per_cell, 1))
            C = cfg.total_cells
            if pair_mode == "cell" and C > max_block:
                blk = max_block
                while C % blk != 0:
                    blk -= 1
                cell_block_val = blk
            typeid_np = np.asarray(snapshot.typeid)
            lj_active_type = np.any(np.asarray(eps) != 0, axis=1)
            inert = (
                ~lj_active_type[typeid_np]
                & (np.asarray(snapshot.charge) == 0)
            )
            excl_np = exclusion_table(snapshot.N, snapshot.bond_group)
            cell_pallas = None
            if uniform_rcut_val is not None and enable_lj and enable_coulomb:
                from cavmd_tpu.ops.pallas_kernels import CellPallasPack

                cell_pallas = CellPallasPack.create(
                    typeid_np, snapshot.charge, eps, sig, excl_np,
                    snapshot.N,
                )
            cell_fields.update(
                cell_features=make_particle_features(
                    snapshot.typeid, snapshot.charge, len(types)
                ),
                cell_exclusions=jnp.asarray(excl_np),
                # zcol builds its own merged 9-column halo; the 27-cell
                # bucket stencil is meaningless on the (cx, cy, 1) grid
                cell_neighbors=(
                    None if pair_mode == "zcol" else jnp.asarray(
                        neighbor_cell_table(cfg.ncells), jnp.int32
                    )
                ),
                pair_inert=jnp.asarray(inert),
                cell_pallas_pack=cell_pallas,
            )

        if kappa is not None:
            kappa_val = kappa
        elif kappa_mode == "kolafa-perram":
            kappa_val = auto_kappa_error_estimate(
                snapshot.charge, np.asarray(snapshot.box_L), r_cut,
            )
        else:
            kappa_val = auto_kappa(r_cut, ewald_accuracy)
        pppm, order = PPPMParams.create(
            np.asarray(snapshot.box_L), mesh=pppm_mesh, order=pppm_order,
            kappa=kappa_val, dtype=dtype,
        )

        omegac = PhysicalConstants.omega_from_cm1(freq_cm1)
        cav = CavityParams.create(omegac, coupling, phmass, dtype=dtype)

        l_typeid = types.index("L") if "L" in types else -1

        return ForceField(
            bond_k=bond_k,
            bond_r0=bond_r0,
            bond_gi=bond_gi,
            bonds_strided=bonds_strided,
            n_bonds=int(nb),
            bond_gj=bond_gj,
            bond_k_per=bond_k_per,
            bond_r0_per=bond_r0_per,
            lj_pair=lj_pair,
            excl_mask=excl,
            cavity=cav,
            coulomb_active=coulomb_active_jnp,
            kappa=jnp.asarray(kappa_val, dtype),
            pppm=pppm,
            **cell_fields,
            l_typeid=l_typeid,
            coulomb_rcut=r_cut,
            pppm_order=order,
            pppm_mesh=tuple(pppm_mesh),
            enable_cavity=enable_cavity and l_typeid >= 0,
            enable_coulomb=enable_coulomb,
            enable_lj=enable_lj,
            enable_bonds=enable_bonds,
            pair_mode=pair_mode,
            cell_cfg=cell_cfg_tuple,
            cell_block=cell_block_val,
            pallas_pack=pallas_pack,
            custom_forces=tuple(custom_forces),
            uniform_rcut=uniform_rcut_val,
            ghost_typeid=(
                types.index("__ghost__") if "__ghost__" in types else -1
            ),
            n_types=len(types),
        )


jax.tree_util.register_dataclass(
    ForceField,
    data_fields=[
        "bond_k", "bond_r0",
        "bond_gi", "bond_gj", "bond_k_per", "bond_r0_per",
        "lj_pair", "excl_mask",
        "cavity", "coulomb_active", "kappa", "pppm",
        "lj_eps", "lj_sigma", "lj_rcut",
        "cell_features", "cell_exclusions", "cell_neighbors", "pallas_pack",
        "pair_inert", "cell_pallas_pack",
    ],
    meta_fields=[
        "l_typeid", "coulomb_rcut", "pppm_order", "pppm_mesh",
        "enable_cavity", "enable_coulomb", "enable_lj", "enable_bonds",
        "pair_mode", "cell_cfg", "cell_block", "n_types", "custom_forces",
        "uniform_rcut", "ghost_typeid", "bonds_strided", "n_bonds",
        "zcol_W",
    ],
)
