"""Ewald electrostatics: real-space pair part, self/exclusion corrections,
and an exact k-space sum (the correctness oracle for the PPPM mesh path).

Rebuilds the consumed ``hoomd.md.long_range.pppm.make_pppm_coulomb_forces``
surface (SURVEY.md §2.3; configured at reference
``examples/05_advanced_run.py:598-604`` with resolution 32^3, order 6,
r_cut 15, alpha 0). HOOMD splits the interaction into an "Ewald short"
pair force and a "Coulomb long" mesh force; this module provides the short
part plus corrections, :mod:`cavmd_tpu.ops.pppm` provides the mesh part.

Total Coulomb energy of a neutral periodic system:

    E = E_real + E_kspace - E_self - E_excluded

    E_real  = 1/2 sum_{i!=j, r<rc, not excl} q_i q_j erfc(kappa r)/r
    E_k     = (2 pi / V) sum_{k!=0} exp(-k^2/4 kappa^2)/k^2 |rho(k)|^2
    E_self  = kappa/sqrt(pi) sum_i q_i^2
    E_excl  = sum_{(i,j) excluded} q_i q_j erf(kappa r_ij)/r_ij

(the excluded-pair term removes the reciprocal-space contribution of
bonded pairs, matching the HOOMD nlist ``exclusions=('bond',)`` semantics).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

from cavmd_tpu.core.box import minimum_image


def auto_kappa(r_cut, accuracy=1e-6):
    """Choose the Ewald splitting parameter from the real-space cutoff.

    Picks kappa such that erfc(kappa * r_cut) ~ accuracy, the standard
    heuristic. Host-side; uses a bisection on math.erfc (no scipy
    dependency). See :func:`auto_kappa_error_estimate` for the
    HOOMD-style system-aware tuning (the reference passes ``alpha=0.0``
    at ``examples/05_advanced_run.py:601-603``, which triggers HOOMD's
    internal error-estimate root-find).
    """
    lo, hi = 0.0, 30.0
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        if math.erfc(mid) > accuracy:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi) / float(r_cut)


def real_space_rms_error(kappa, charge, box_L, r_cut):
    """Kolafa-Perram RMS real-space force-error estimate (host-side).

    ``Delta F ~= 2 Q^2 / sqrt(N r_cut V) * exp(-kappa^2 r_cut^2)`` with
    ``Q^2 = sum q_i^2`` — the standard truncation-error estimate (Kolafa
    & Perram 1992, eq. 18) that HOOMD's PPPM setup uses to pick kappa
    when the user passes ``alpha=0`` (the reference's configuration,
    ``examples/05_advanced_run.py:601-603``).
    """
    import numpy as np

    q = np.asarray(charge, np.float64)
    n = max(len(q), 1)
    v = float(np.prod(np.asarray(box_L, np.float64)))
    q2 = float(np.sum(q * q))
    return (2.0 * q2 / math.sqrt(n * float(r_cut) * v)
            * math.exp(-(kappa * float(r_cut)) ** 2))


def auto_kappa_error_estimate(charge, box_L, r_cut, accuracy=1e-4):
    """System-aware kappa tuning: root-find on the Kolafa-Perram estimate.

    Solves ``real_space_rms_error(kappa) = accuracy * q_scale`` for kappa
    by bisection, where ``q_scale = max|q|^2 / typical r^2`` normalizes
    the absolute error estimate to the force scale of the system (HOOMD
    normalizes by the charge scale the same way; exact digit parity with
    HOOMD is not claimed — its C++ root-find is not in the mirror — but
    the estimator family and the alpha=0 auto-tune semantics match).

    Falls back to :func:`auto_kappa` when the system carries no charge.
    """
    import numpy as np

    q = np.asarray(charge, np.float64)
    if not np.any(q != 0.0):
        return auto_kappa(r_cut)
    qmax2 = float(np.max(np.abs(q))) ** 2
    target = accuracy * qmax2 / (float(r_cut) ** 2)
    lo, hi = 1e-6, 30.0 / float(r_cut)
    if real_space_rms_error(hi, q, box_L, r_cut) > target:
        return hi  # cannot reach the target inside r_cut; best effort
    for _ in range(100):
        mid = 0.5 * (lo + hi)
        if real_space_rms_error(mid, q, box_L, r_cut) > target:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def ewald_real_space(
    position,
    box_L,
    charge,
    kappa,
    r_cut,
    exclusion_mask=None,
):
    """Real-space (short-range) Ewald pair force + energy, all-pairs dense.

    This is the TPU analog of HOOMD's "Ewald short" pair force. Excluded
    (bonded) pairs are skipped entirely here, as with an exclusion-aware
    neighbor list.

    Returns (forces (N,3), energy scalar).
    """
    dtype = position.dtype
    n = position.shape[0]
    kappa = jnp.asarray(kappa, dtype)

    dr = minimum_image(position[:, None, :] - position[None, :, :], box_L)
    r2 = jnp.sum(dr * dr, axis=-1)

    qq = charge[:, None] * charge[None, :]
    eye = jnp.eye(n, dtype=bool)
    # qq == 0 pairs contribute nothing; masking them also keeps coincident
    # chargeless ghost particles (mesh padding) from producing 0 * inf NaNs
    active = (~eye) & (r2 < r_cut * r_cut) & (qq != 0)
    if exclusion_mask is not None:
        active = active & (~exclusion_mask)

    r2_safe = jnp.where(active, r2, jnp.ones((), dtype))
    r = jnp.sqrt(r2_safe)

    erfc_term = erfc(kappa * r)
    e_pair = jnp.where(active, qq * erfc_term / r, jnp.zeros((), dtype))
    energy = 0.5 * jnp.sum(e_pair)

    # dV/dr = -qq [ erfc(kr)/r^2 + 2k/sqrt(pi) exp(-k^2 r^2)/r ]
    two_over_sqrt_pi = jnp.asarray(2.0 / math.sqrt(math.pi), dtype)
    fmag = jnp.where(
        active,
        qq
        * (
            erfc_term / r2_safe
            + kappa * two_over_sqrt_pi * jnp.exp(-(kappa * r) ** 2) / r
        )
        / r,
        jnp.zeros((), dtype),
    )
    forces = jnp.sum(fmag[:, :, None] * dr, axis=1)
    return forces, energy


def ewald_real_space_pair(position, box_L, qq, active_static, kappa, r_cut):
    """Real-space Ewald with precomputed (N,N) charge products and a static
    active mask — the zero-gather hot path (see LJPairMatrices note)."""
    dtype = position.dtype
    kappa = jnp.asarray(kappa, dtype)

    dr = minimum_image(position[:, None, :] - position[None, :, :], box_L)
    r2 = jnp.sum(dr * dr, axis=-1)
    active = active_static & (r2 < r_cut * r_cut)

    r2_safe = jnp.where(active, r2, jnp.ones((), dtype))
    r = jnp.sqrt(r2_safe)
    erfc_term = erfc(kappa * r)
    zero = jnp.zeros((), dtype)
    energy = 0.5 * jnp.sum(jnp.where(active, qq * erfc_term / r, zero))

    two_over_sqrt_pi = jnp.asarray(2.0 / math.sqrt(math.pi), dtype)
    fmag = jnp.where(
        active,
        qq
        * (
            erfc_term / r2_safe
            + kappa * two_over_sqrt_pi * jnp.exp(-(kappa * r) ** 2) / r
        )
        / r,
        zero,
    )
    forces = jnp.sum(fmag[:, :, None] * dr, axis=1)
    return forces, energy


def ewald_self_energy(charge, kappa):
    """Self-interaction correction kappa/sqrt(pi) * sum q_i^2 (subtracted)."""
    dtype = charge.dtype
    return (
        jnp.asarray(kappa, dtype)
        / jnp.asarray(math.sqrt(math.pi), dtype)
        * jnp.sum(charge * charge)
    )


def _excl_pair_terms(dr, qq, kappa, dtype):
    """Shared physics of the exclusion correction: per-bond energy terms
    and the force on endpoint i (``fmag * dr``), given min-imaged
    displacements ``dr`` (Nb, 3) and charge products ``qq`` (Nb,).

    d/dr [erf(kr)/r] = [2k/sqrt(pi) exp(-k^2 r^2) - erf(kr)/r] / r.
    The three variants below differ only in endpoint access and force
    accumulation (gather/scatter vs incidence matmuls vs reshape views).
    """
    kappa = jnp.asarray(kappa, dtype)
    r2 = jnp.sum(dr * dr, axis=1)
    r = jnp.sqrt(r2)
    # guard r = 0: real bonds never coincide, but the domain-decomposed
    # layout (parallel/domain.py) pads each shard's bond table with inert
    # filler pairs (k = q = 0) whose endpoints share one template position;
    # erf_term is exactly 0 there, so the guarded division returns 0
    # instead of NaN. For r > 0 the where() passes r through bit-exactly.
    safe_r = jnp.where(r > 0, r, jnp.ones((), dtype))
    safe_r2 = jnp.where(r2 > 0, r2, jnp.ones((), dtype))
    erf_term = 1.0 - erfc(kappa * r)
    energy = jnp.sum(qq * erf_term / safe_r)
    two_over_sqrt_pi = jnp.asarray(2.0 / math.sqrt(math.pi), dtype)
    fmag = (
        qq
        * (
            erf_term / safe_r2
            - kappa * two_over_sqrt_pi * jnp.exp(-(kappa * r) ** 2) / safe_r
        )
        / safe_r
    )
    return fmag[:, None] * dr, energy


def ewald_exclusion_correction(position, box_L, charge, kappa, bond_group):
    """Remove the reciprocal-space contribution of excluded (bonded) pairs.

    Returns (forces (N,3), energy scalar) of the correction term
    ``sum_bonds q_i q_j erf(kappa r)/r`` which must be *subtracted* from the
    long-range part.
    """
    dtype = position.dtype
    n = position.shape[0]
    if bond_group.shape[0] == 0:
        return jnp.zeros_like(position), jnp.zeros((), dtype)

    i = bond_group[:, 0]
    j = bond_group[:, 1]
    dr = minimum_image(position[i] - position[j], box_L)
    f_i, energy = _excl_pair_terms(dr, charge[i] * charge[j], kappa, dtype)

    forces = jnp.zeros((n, 3), dtype)
    forces = forces.at[i].add(f_i)
    forces = forces.at[j].add(-f_i)
    return forces, energy


def ewald_exclusion_correction_incidence(position, box_L, gi, gj, charge,
                                         kappa):
    """Exclusion correction via bond-incidence matmuls (zero gathers).

    Same physics as :func:`ewald_exclusion_correction`; the endpoint
    gathers + force scatter-adds cost ~35 us/step at Nb=250 on v5e (XLA
    serializes them, and under a vmapped replica batch they serialize per
    replica) — with static topology the dataflow is the same four small
    MXU matmuls as the incidence bond path (ops/bonds.py:18-35). Charge
    products come from the live ``charge`` argument (two matvecs), so
    every branch of the dispatch sees the same electrostatics.
    """
    dtype = position.dtype
    # HIGHEST: position-carrying matmuls must not round to bf16 (see
    # ops/bonds.py heating-bug note); charges get the same treatment
    hp = jax.lax.Precision.HIGHEST
    pos_i = jnp.dot(gi, position, precision=hp, preferred_element_type=dtype)
    pos_j = jnp.dot(gj, position, precision=hp, preferred_element_type=dtype)
    q_i = jnp.dot(gi, charge, precision=hp, preferred_element_type=dtype)
    q_j = jnp.dot(gj, charge, precision=hp, preferred_element_type=dtype)
    dr = minimum_image(pos_i - pos_j, box_L)
    f_i, energy = _excl_pair_terms(dr, q_i * q_j, kappa, dtype)
    forces = jnp.dot(gi.T, f_i, precision=hp, preferred_element_type=dtype) \
        - jnp.dot(gj.T, f_i, precision=hp, preferred_element_type=dtype)
    return forces, energy


def ewald_exclusion_correction_strided(position, box_L, charge, kappa,
                                       n_bonds: int):
    """Exclusion correction for consecutive-pair topology (bond b =
    particles (2b, 2b+1)): gather/scatter-free at any size.

    Same physics as :func:`ewald_exclusion_correction`; endpoint access is
    a reshape view and force accumulation the inverse reshape (see
    ops/bonds.py:harmonic_bond_force_strided for the pattern and measured
    costs). Charge products come from the live ``charge`` argument via the
    same reshape view.
    """
    dtype = position.dtype
    n = position.shape[0]
    pp = position[:2 * n_bonds].reshape(n_bonds, 2, 3)
    qq_b = charge[:2 * n_bonds].reshape(n_bonds, 2).prod(axis=1)
    dr = minimum_image(pp[:, 0] - pp[:, 1], box_L)  # i - j
    f_i, energy = _excl_pair_terms(dr, qq_b, kappa, dtype)
    # force on i (to be SUBTRACTED by the caller)
    fpair = jnp.stack([f_i, -f_i], axis=1).reshape(2 * n_bonds, 3)
    if 2 * n_bonds < n:
        fpair = jnp.concatenate(
            [fpair, jnp.zeros((n - 2 * n_bonds, 3), dtype)]
        )
    return fpair, energy


def kspace_vectors(box_L, nmax, dtype):
    """Integer reciprocal lattice grid (2*nmax+1)^3 as k-vectors (k != 0)."""
    import numpy as np

    ns = np.arange(-nmax, nmax + 1)
    grid = np.stack(np.meshgrid(ns, ns, ns, indexing="ij"), -1).reshape(-1, 3)
    grid = grid[np.any(grid != 0, axis=1)]
    box_np = np.asarray(box_L, dtype=float)
    return jnp.asarray(2.0 * np.pi * grid / box_np[None, :], dtype=dtype)


def ewald_kspace_exact(position, charge, box_L, kappa, nmax=12):
    """Exact reciprocal-space Ewald sum (oracle for PPPM; O(N * nk)).

    Returns (forces (N,3), energy scalar). Energy excludes self/exclusion
    corrections (apply separately).
    """
    dtype = position.dtype
    kvecs = kspace_vectors(box_L, nmax, dtype)  # (nk, 3)
    volume = jnp.prod(jnp.asarray(box_L, dtype))
    kappa = jnp.asarray(kappa, dtype)

    kr = position @ kvecs.T  # (N, nk)
    cos_kr = jnp.cos(kr)
    sin_kr = jnp.sin(kr)
    rho_re = charge @ cos_kr  # (nk,)
    rho_im = charge @ sin_kr

    k2 = jnp.sum(kvecs * kvecs, axis=1)
    green = jnp.exp(-k2 / (4.0 * kappa * kappa)) / k2  # (nk,)
    pref = 2.0 * jnp.pi / volume

    energy = pref * jnp.sum(green * (rho_re**2 + rho_im**2))

    # F_i = -dE/dr_i = (4 pi / V) q_i sum_k G(k) k [sin(kr_i) Re rho - cos(kr_i) Im rho]
    coef = 2.0 * pref * green  # (nk,) — the 2 from d|rho|^2 = 2 rho drho
    site = sin_kr * rho_re[None, :] - cos_kr * rho_im[None, :]  # (N, nk)
    forces = charge[:, None] * ((coef[None, :] * site) @ kvecs)
    return forces, energy


def coulomb_direct_reference(position, box_L, charge, bond_group=None, nmax_real=2):
    """Brute-force Coulomb energy over periodic images (slow; tests only).

    Sums 1/r over real-space images out to ``nmax_real`` boxes — converges
    poorly in general but adequately for well-separated small test systems.
    """
    import numpy as np

    pos = np.asarray(position)
    q = np.asarray(charge)
    L = np.asarray(box_L)
    n = len(q)
    excluded = set()
    if bond_group is not None:
        for a, b in np.asarray(bond_group):
            excluded.add((int(a), int(b)))
            excluded.add((int(b), int(a)))
    e = 0.0
    shifts = [
        np.array([ix, iy, iz]) * L
        for ix in range(-nmax_real, nmax_real + 1)
        for iy in range(-nmax_real, nmax_real + 1)
        for iz in range(-nmax_real, nmax_real + 1)
    ]
    for i in range(n):
        for j in range(n):
            for s in shifts:
                if i == j and not s.any():
                    continue
                if (i, j) in excluded and not s.any():
                    continue
                r = np.linalg.norm(pos[i] - pos[j] + s)
                e += 0.5 * q[i] * q[j] / r
    return e
