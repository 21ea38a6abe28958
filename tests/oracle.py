"""NumPy oracle: an independent scalar-loop implementation of the physics.

This module re-implements the *documented semantics* of the reference CPU
plugin (cav-hoomd ``src/CavityForceCompute.cc``, HOOMD harmonic bonds and
shifted LJ) in plain NumPy loops, serving as the correctness reference that
BASELINE.md's 1e-10 energy-match target is measured against. It is written
from the physics definitions, deliberately in the most literal (slow,
per-particle loop) style so mistakes don't correlate with the vectorized
JAX implementation.
"""

import numpy as np


def oracle_cavity(pos, image, box_L, charge, typeid, l_typeid, omegac, couplstr, phmass=1.0):
    """Cavity force/energies per CavityForceCompute.cc:131-208 semantics."""
    n = len(charge)
    K = phmass * omegac**2
    forces = np.zeros((n, 3))

    photon_idx = -1
    for i in range(n):
        if typeid[i] == l_typeid:
            photon_idx = i
            break
    if photon_idx == -1:
        return forces, dict(harmonic=0.0, coupling=0.0, dipole_self=0.0)

    unwrapped = np.zeros((n, 3))
    for i in range(n):
        for d in range(3):
            unwrapped[i, d] = pos[i, d] + image[i, d] * box_L[d]

    dipole = np.zeros(3)
    for i in range(n):
        if i != photon_idx:
            dipole += charge[i] * unwrapped[i]

    q = unwrapped[photon_idx]
    q_xy = np.array([q[0], q[1], 0.0])
    d_xy = np.array([dipole[0], dipole[1], 0.0])

    e_harm = 0.5 * K * np.dot(q, q)
    e_coup = couplstr * np.dot(d_xy, q_xy)
    e_self = 0.5 * (couplstr**2 / K) * np.dot(d_xy, d_xy)

    Dq = q_xy + (couplstr / K) * d_xy
    for i in range(n):
        if i != photon_idx:
            f = -couplstr * charge[i] * Dq
            forces[i, 0] = f[0]
            forces[i, 1] = f[1]
            forces[i, 2] = 0.0
    forces[photon_idx] = -K * q - couplstr * d_xy
    return forces, dict(harmonic=e_harm, coupling=e_coup, dipole_self=e_self)


def _min_image(dr, box_L):
    return dr - box_L * np.round(dr / box_L)


def oracle_harmonic_bonds(pos, box_L, bond_group, bond_typeid, k_table, r0_table):
    n = len(pos)
    forces = np.zeros((n, 3))
    energy = 0.0
    for b in range(len(bond_group)):
        i, j = bond_group[b]
        k = k_table[bond_typeid[b]]
        r0 = r0_table[bond_typeid[b]]
        dr = _min_image(pos[j] - pos[i], np.asarray(box_L))
        r = np.linalg.norm(dr)
        energy += 0.5 * k * (r - r0) ** 2
        f_j = -k * (r - r0) * dr / r
        forces[j] += f_j
        forces[i] -= f_j
    return forces, energy


def oracle_lj_shifted(pos, box_L, typeid, eps, sig, rcut, excluded_pairs=()):
    """Shifted LJ, all pairs, per-type tables; excluded_pairs is a set of
    frozenset({i, j})."""
    n = len(pos)
    forces = np.zeros((n, 3))
    energy = 0.0
    excl = {frozenset(p) for p in excluded_pairs}
    for i in range(n):
        for j in range(i + 1, n):
            if frozenset((i, j)) in excl:
                continue
            e = eps[typeid[i], typeid[j]]
            s = sig[typeid[i], typeid[j]]
            rc = rcut[typeid[i], typeid[j]]
            if e == 0.0 or rc <= 0.0:
                continue
            dr = _min_image(pos[i] - pos[j], np.asarray(box_L))
            r2 = np.dot(dr, dr)
            if r2 >= rc * rc:
                continue
            sr6 = (s * s / r2) ** 3
            sr12 = sr6 * sr6
            src6 = (s / rc) ** 6
            vshift = 4 * e * (src6 * src6 - src6)
            energy += 4 * e * (sr12 - sr6) - vshift
            fmag = 24 * e * (2 * sr12 - sr6) / r2
            forces[i] += fmag * dr
            forces[j] -= fmag * dr
    return forces, energy


def oracle_ewald_real(pos, box_L, charge, kappa, r_cut, excluded_pairs=()):
    from scipy.special import erfc

    n = len(pos)
    forces = np.zeros((n, 3))
    energy = 0.0
    excl = {frozenset(p) for p in excluded_pairs}
    for i in range(n):
        for j in range(i + 1, n):
            if frozenset((i, j)) in excl:
                continue
            dr = _min_image(pos[i] - pos[j], np.asarray(box_L))
            r = np.linalg.norm(dr)
            if r >= r_cut:
                continue
            qq = charge[i] * charge[j]
            energy += qq * erfc(kappa * r) / r
            fmag = (
                qq
                * (
                    erfc(kappa * r) / r**2
                    + 2 * kappa / np.sqrt(np.pi) * np.exp(-((kappa * r) ** 2)) / r
                )
                / r
            )
            forces[i] += fmag * dr
            forces[j] -= fmag * dr
    return forces, energy
