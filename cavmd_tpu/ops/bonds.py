"""Harmonic bond force: V = 1/2 k (r - r0)^2 per bond.

Rebuilds the consumed ``hoomd.md.bond.Harmonic`` surface (SURVEY.md §2.3;
used by reference ``examples/05_advanced_run.py:567-570``). Bonds are a
static (Nb, 2) index table; forces accumulate with two scatter-adds — a
shape-static pattern XLA fuses well. Minimum-image displacement is used so
bonds work across the periodic boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cavmd_tpu.core.box import minimum_image


def bond_incidence(n, bond_group, dtype):
    """Static (Nb, N) selector matrices (G_i, G_j) for the bond endpoints.

    TPU-native design note: endpoint gathers + force scatter-adds cost
    ~30 us/step at Nb=250 on v5e (XLA serializes them); with static
    topology the same dataflow is four small MXU matmuls:
    ``r_i = G_i @ pos`` and ``F += G_j^T @ f - G_i^T @ f``. Dense (Nb, N)
    is fine up to ~10^7 entries; beyond that use the scatter path.
    """
    import numpy as np

    nb = len(bond_group)
    gi = np.zeros((nb, n), dtype=np.float64)
    gj = np.zeros((nb, n), dtype=np.float64)
    bg = np.asarray(bond_group)
    gi[np.arange(nb), bg[:, 0]] = 1.0
    gj[np.arange(nb), bg[:, 1]] = 1.0
    return jnp.asarray(gi, dtype), jnp.asarray(gj, dtype)


def harmonic_bond_force_incidence(position, box_L, gi, gj, kb, rb):
    """Harmonic bonds via incidence matmuls (zero gathers/scatters).

    ``kb``/``rb`` are per-bond (Nb,) parameters, pre-expanded from the
    per-type tables at setup (topology is static).
    """
    dtype = position.dtype
    # HIGHEST precision: TPU f32 matmuls default to bf16 passes (8 mantissa
    # bits) — bf16-rounded positions inject catastrophic bond-force noise
    # (measured: NVE heats 100 K -> 6000 K in 30k steps without this)
    hp = jax.lax.Precision.HIGHEST
    pos_i = jnp.dot(gi, position, precision=hp, preferred_element_type=dtype)
    pos_j = jnp.dot(gj, position, precision=hp, preferred_element_type=dtype)
    dr = minimum_image(pos_j - pos_i, box_L)
    r = jnp.sqrt(jnp.sum(dr * dr, axis=1))

    safe_r = jnp.where(r > 0, r, jnp.ones((), dtype))
    fmag = -kb * (r - rb) / safe_r
    f_j = fmag[:, None] * dr  # force on j

    forces = jnp.dot(gj.T, f_j, precision=hp, preferred_element_type=dtype) \
        - jnp.dot(gi.T, f_j, precision=hp, preferred_element_type=dtype)
    energy = jnp.sum(0.5 * kb * (r - rb) ** 2)
    return forces, energy


def harmonic_bond_force_strided(position, box_L, n_bonds: int, kb, rb):
    """Harmonic bonds for consecutive-pair topology: bond b = (2b, 2b+1).

    The reference workload family (diatomic molecules laid out molecule-
    major, ref ``examples/05_advanced_run.py:567-570`` + the init-0.gsd
    convention) has exactly this topology, and it makes the bond pass
    gather/scatter-free at ANY system size: endpoints are a reshape view
    ``position[:2Nb].reshape(Nb, 2, 3)`` and the force accumulation is the
    inverse reshape — zero data movement beyond the (Nb, 3) force rows.
    (The generic scatter path costs ~2 ms/step at Nb=50k on v5e, measured;
    the incidence-matmul path is capped at Nb*N <= 8e6.)

    ``kb``/``rb``: per-bond (Nb,) parameters. Returns (forces, energy).
    """
    dtype = position.dtype
    n = position.shape[0]
    pp = position[:2 * n_bonds].reshape(n_bonds, 2, 3)
    dr = minimum_image(pp[:, 1] - pp[:, 0], box_L)
    r = jnp.sqrt(jnp.sum(dr * dr, axis=1))

    safe_r = jnp.where(r > 0, r, jnp.ones((), dtype))
    fmag = -kb * (r - rb) / safe_r
    f_j = fmag[:, None] * dr

    fpair = jnp.stack([-f_j, f_j], axis=1).reshape(2 * n_bonds, 3)
    if 2 * n_bonds < n:
        fpair = jnp.concatenate(
            [fpair, jnp.zeros((n - 2 * n_bonds, 3), dtype)]
        )
    energy = jnp.sum(0.5 * kb * (r - rb) ** 2)
    return fpair, energy


def bonds_are_consecutive(bond_group) -> bool:
    """True iff bond b connects particles (2b, 2b+1) for every b
    (host-side topology check at setup)."""
    import numpy as np

    bg = np.asarray(bond_group)
    nb = bg.shape[0]
    if nb == 0:
        return False
    return bool(np.array_equal(bg, np.arange(2 * nb).reshape(nb, 2)))


def harmonic_bond_force(position, box_L, bond_group, bond_typeid, k, r0):
    """Harmonic bond forces and total energy.

    Args:
        position: (N,3) wrapped positions.
        box_L: (3,) box lengths.
        bond_group: (Nb,2) int — particle indices per bond.
        bond_typeid: (Nb,) int — bond type per bond.
        k, r0: (n_bond_types,) per-type spring constants / rest lengths.

    Returns:
        (forces (N,3), energy scalar).
    """
    dtype = position.dtype
    n = position.shape[0]
    if bond_group.shape[0] == 0:
        return jnp.zeros_like(position), jnp.zeros((), dtype)

    i = bond_group[:, 0]
    j = bond_group[:, 1]
    dr = minimum_image(position[j] - position[i], box_L)  # (Nb,3)
    r = jnp.sqrt(jnp.sum(dr * dr, axis=1))

    kb = jnp.asarray(k, dtype)[bond_typeid]
    rb = jnp.asarray(r0, dtype)[bond_typeid]

    # F_j = -k (r - r0) * dr/r ; guard r=0 (coincident particles)
    safe_r = jnp.where(r > 0, r, jnp.ones((), dtype))
    fmag = -kb * (r - rb) / safe_r
    f_j = fmag[:, None] * dr

    forces = jnp.zeros((n, 3), dtype)
    forces = forces.at[j].add(f_j)
    forces = forces.at[i].add(-f_j)

    energy = jnp.sum(0.5 * kb * (r - rb) ** 2)
    return forces, energy
