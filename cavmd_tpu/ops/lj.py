"""Shifted Lennard-Jones pair force with per-type-pair parameters.

Rebuilds the consumed ``hoomd.md.pair.LJ(mode='shift')`` surface with bond
exclusions (SURVEY.md §2.3; configured at reference
``examples/05_advanced_run.py:573-596``, including the zeroed ('L', *) rows
that make the photon inert to pair interactions — here an epsilon of 0 and
r_cut of 0 give exactly the same behavior).

Two code paths:

- ``lj_dense``: all-pairs O(N^2) with minimum image — the default for the
  reference-scale system (N ~ 500). On TPU this is a fully vectorized
  elementwise program over an (N, N) tile grid; no neighbor-list rebuild
  logic, no dynamic shapes, and XLA fuses the whole thing with the rest of
  the step. For N up to a few thousand this beats a cell list outright.
- the cell-list path in :mod:`cavmd_tpu.ops.neighbor` for large N.

Energy convention: ``V(r) = 4 eps [(s/r)^12 - (s/r)^6] - V(r_cut)`` for
``r < r_cut`` (shift mode), half-counted per ordered pair.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cavmd_tpu.core.box import minimum_image


def lj_pair_tables(types, lj_params, default_rcut=0.0, dtype=None):
    """Build (T,T) epsilon/sigma/r_cut tables from a {(a,b): dict} mapping.

    Mirrors HOOMD's symmetric per-type-pair parameter dict: entries may be
    given as ('O','N') or ('N','O'); missing pairs default to epsilon=0,
    r_cut=0 (interaction disabled) — which is how the reference disables
    photon pair interactions (05_advanced_run.py:584-595).
    """
    import numpy as np

    t = len(types)
    eps = np.zeros((t, t))
    sig = np.ones((t, t))
    rcut = np.full((t, t), default_rcut)
    for (a, b), p in lj_params.items():
        ia, ib = types.index(a), types.index(b)
        eps[ia, ib] = eps[ib, ia] = p["epsilon"]
        sig[ia, ib] = sig[ib, ia] = p["sigma"]
        rc = p.get("r_cut", default_rcut)
        rcut[ia, ib] = rcut[ib, ia] = rc
    return (
        jnp.asarray(eps, dtype=dtype),
        jnp.asarray(sig, dtype=dtype),
        jnp.asarray(rcut, dtype=dtype),
    )


def _pair_eps_sig_rcut(typeid, eps_table, sigma_table, rcut_table):
    """Gather per-pair parameter matrices from type tables."""
    eps = eps_table[typeid[:, None], typeid[None, :]]
    sig = sigma_table[typeid[:, None], typeid[None, :]]
    rc = rcut_table[typeid[:, None], typeid[None, :]]
    return eps, sig, rc


def lj_dense(
    position,
    box_L,
    typeid,
    eps_table,
    sigma_table,
    rcut_table,
    exclusion_mask=None,
):
    """All-pairs shifted LJ forces and energy.

    Args:
        position: (N,3) wrapped positions.
        box_L: (3,) box lengths.
        typeid: (N,) int type ids.
        eps_table, sigma_table, rcut_table: (T,T) symmetric parameter tables.
        exclusion_mask: optional (N,N) bool — True where the pair is
            *excluded* (e.g. bonded pairs; HOOMD ``exclusions=('bond',)``).

    Returns:
        (forces (N,3), energy scalar).
    """
    dtype = position.dtype
    n = position.shape[0]

    dr = minimum_image(position[:, None, :] - position[None, :, :], box_L)
    r2 = jnp.sum(dr * dr, axis=-1)  # (N,N)

    eps, sig, rc = _pair_eps_sig_rcut(typeid, eps_table, sigma_table, rcut_table)

    eye = jnp.eye(n, dtype=bool)
    active = (~eye) & (r2 < rc * rc) & (eps != 0)
    if exclusion_mask is not None:
        active = active & (~exclusion_mask)

    # guard r2 for masked-out entries to avoid inf/nan in the dead lanes
    r2_safe = jnp.where(active, r2, jnp.ones((), dtype))
    inv_r2 = sig * sig / r2_safe
    s6 = inv_r2 * inv_r2 * inv_r2
    s12 = s6 * s6

    # energy shift at the cutoff (mode='shift')
    rc_safe = jnp.where(rc > 0, rc, jnp.ones((), dtype))
    src6 = (sig / rc_safe) ** 6
    v_shift = 4.0 * eps * (src6 * src6 - src6)

    v = jnp.where(active, 4.0 * eps * (s12 - s6) - v_shift, jnp.zeros((), dtype))
    energy = 0.5 * jnp.sum(v)

    # F_i = sum_j 24 eps (2 s12 - s6) / r^2 * dr_ij  (dr = r_i - r_j)
    fscalar = jnp.where(
        active, 24.0 * eps * (2.0 * s12 - s6) / r2_safe, jnp.zeros((), dtype)
    )
    forces = jnp.sum(fscalar[:, :, None] * dr, axis=1)
    return forces, energy


class LJPairMatrices:
    """Rank-T per-pair parameters for the dense path (virtual (N,N) tables).

    TPU-native design notes (each measured on v5e):

    - indexing (T,T) tables with a typeid outer product
      (``eps[typeid[:,None], typeid[None,:]]``) lowers to N^2 serialized
      scalar gathers on TPU (~2.6 ms/step at N=501) — never do that in
      the hot loop.
    - round 1 precomputed dense (N,N) f32 matrices instead. Correct, but
      the hot pass then READS 4 * N^2 * 4 B of parameters from HBM per
      force evaluation — ~4 MB at N=501, and per *replica* under the
      vmapped batch (32 MB/step at B=8), which is pure bandwidth on the
      usual TPU bottleneck.
    - a type-pair table is rank-T by construction:
      ``X[i,j] = rows_X[i, tid_j] = sum_t rows_X[i,t] * onehot[j,t]``.
      So only the (N,T) row-gathers are precomputed and the (N,N)
      matrices are *virtual* — rebuilt inside the fused elementwise loop
      as T broadcast FMAs per table (T=3 for the reference workload).
      HBM traffic drops from 4 f32 loads/pair to ~0 (the (N,T) factors
      live in registers/VMEM across the tiled loop); the FMAs ride the
      VPU, which has headroom — the pass is bandwidth-bound, not
      FLOP-bound.

    The static ``active`` mask (type pair enabled, not excluded, not
    self) stays dense: bools are 1 B/pair and mix exclusion structure
    that is not rank-T.
    """

    def __init__(self, rows_eps, rows_sig2, rows_rcut2, rows_vshift, oh,
                 active):
        self.rows_eps = rows_eps
        self.rows_sig2 = rows_sig2
        self.rows_rcut2 = rows_rcut2
        self.rows_vshift = rows_vshift
        self.oh = oh  # (N,T) one-hot of typeid, parameter dtype
        self.active = active  # (N,N) bool

    def virtual(self):
        """The four (N,N) parameter 'matrices' as lazy broadcast sums.

        Returned values are sums of T rank-1 outer products of (N,)
        columns — XLA fuses them into the consuming elementwise loop, so
        nothing (N,N)-sized is materialized or read.
        """
        outs = []
        for rows in (self.rows_eps, self.rows_sig2, self.rows_rcut2,
                     self.rows_vshift):
            T = rows.shape[1]
            x = None
            for t in range(T):
                term = rows[:, t, None] * self.oh[None, :, t]
                x = term if x is None else x + term
            outs.append(x)
        return tuple(outs)

    def dense_numpy(self):
        """Materialized (eps, sig2, rcut2, vshift) as NumPy — setup-time
        only (the Pallas pack padder wants host arrays)."""
        import numpy as np

        oh = np.asarray(self.oh)
        return tuple(
            np.asarray(rows) @ oh.T
            for rows in (self.rows_eps, self.rows_sig2, self.rows_rcut2,
                         self.rows_vshift)
        )

    @staticmethod
    def create(typeid, eps_table, sigma_table, rcut_table, exclusion_mask=None):
        import numpy as np

        tid = np.asarray(typeid)
        n = len(tid)
        eps_t = np.asarray(eps_table)
        sig_t = np.asarray(sigma_table)
        rc_t = np.asarray(rcut_table)
        rc_safe = np.where(rc_t > 0, rc_t, 1.0)
        src6 = (sig_t / rc_safe) ** 6
        vshift_t = 4.0 * eps_t * (src6 * src6 - src6)

        eps = eps_t[tid[:, None], tid[None, :]]
        rc = rc_t[tid[:, None], tid[None, :]]
        active = (~np.eye(n, dtype=bool)) & (eps != 0) & (rc > 0)
        if exclusion_mask is not None:
            active &= ~np.asarray(exclusion_mask)

        dtype = eps_table.dtype
        T = eps_t.shape[0]
        oh = (tid[:, None] == np.arange(T)[None, :]).astype(dtype)
        return LJPairMatrices(
            rows_eps=jnp.asarray(eps_t[tid], dtype),
            rows_sig2=jnp.asarray((sig_t * sig_t)[tid], dtype),
            rows_rcut2=jnp.asarray((rc_t * rc_t)[tid], dtype),
            rows_vshift=jnp.asarray(vshift_t[tid], dtype),
            oh=jnp.asarray(oh),
            active=jnp.asarray(active),
        )


jax.tree_util.register_pytree_node(
    LJPairMatrices,
    lambda m: ((m.rows_eps, m.rows_sig2, m.rows_rcut2, m.rows_vshift,
                m.oh, m.active), None),
    lambda _, c: LJPairMatrices(*c),
)


def lj_dense_pair(position, box_L, pair: LJPairMatrices):
    """All-pairs shifted LJ with precomputed pair matrices (the hot path).

    Pairwise arrays are kept component-wise ((N, N) each, lanes = N): a
    trailing xyz dim of 3 lands in the 128-wide lane dimension, and under
    vmap triggers a batch-size-independent ~95 us relayout (measured v5e).
    """
    dtype = position.dtype
    zero = jnp.zeros((), dtype)
    box = jnp.asarray(box_L, dtype)
    eps, sig2, rcut2, vshift = pair.virtual()

    dxs = []
    r2 = None
    for d in range(3):
        x = position[..., d]
        dx = x[..., :, None] - x[..., None, :]
        dx = dx - box[d] * jnp.round(dx / box[d])
        dxs.append(dx)
        r2 = dx * dx if r2 is None else r2 + dx * dx

    active = pair.active & (r2 < rcut2)
    r2_safe = jnp.where(active, r2, jnp.ones((), dtype))
    inv_r2 = sig2 / r2_safe
    s6 = inv_r2 * inv_r2 * inv_r2
    s12 = s6 * s6

    v = jnp.where(active, 4.0 * eps * (s12 - s6) - vshift, zero)
    energy = 0.5 * jnp.sum(v)

    fscalar = jnp.where(
        active, 24.0 * eps * (2.0 * s12 - s6) / r2_safe, zero
    )
    forces = jnp.stack(
        [jnp.sum(fscalar * dxs[d], axis=-1) for d in range(3)], axis=-1
    )
    return forces, energy


def fused_pair_force(
    position, box_L, pair: LJPairMatrices, qq, coulomb_active, kappa, coulomb_rcut,
):
    """Fused dense LJ + short-range-Ewald pass sharing one distance matrix.

    Computing LJ and erfc-Coulomb separately materializes the (N,N,3)
    displacement tensor and (N,N) r^2 twice; this single pass halves that
    HBM traffic — the usual TPU bottleneck. Returns
    (forces, lj_energy, ewald_short_energy).
    """
    import math

    from jax.scipy.special import erfc

    dtype = position.dtype
    zero = jnp.zeros((), dtype)
    box = jnp.asarray(box_L, dtype)
    eps, sig2, rcut2, vshift = pair.virtual()

    # component-wise pairwise displacements: every array stays (N, N) so the
    # TPU lane dimension is N, not 3 — an (N, N, 3) displacement tensor puts
    # 3 in the 128-wide lane dim (measured ~1.5x slower, worse under vmap)
    dxs = []
    r2 = None
    for d in range(3):
        x = position[:, d]
        dx = x[:, None] - x[None, :]
        dx = dx - box[d] * jnp.round(dx / box[d])
        dxs.append(dx)
        r2 = dx * dx if r2 is None else r2 + dx * dx

    # --- LJ ---
    lj_active = pair.active & (r2 < rcut2)
    r2_lj = jnp.where(lj_active, r2, jnp.ones((), dtype))
    inv_r2 = sig2 / r2_lj
    s6 = inv_r2 * inv_r2 * inv_r2
    s12 = s6 * s6
    e_lj = 0.5 * jnp.sum(
        jnp.where(lj_active, 4.0 * eps * (s12 - s6) - vshift, zero)
    )
    f_lj = jnp.where(lj_active, 24.0 * eps * (2.0 * s12 - s6) / r2_lj, zero)

    # --- Ewald short (erfc) ---
    kappa = jnp.asarray(kappa, dtype)
    ew_active = coulomb_active & (r2 < coulomb_rcut * coulomb_rcut)
    r2_ew = jnp.where(ew_active, r2, jnp.ones((), dtype))
    r = jnp.sqrt(r2_ew)
    ec = erfc(kappa * r)
    e_ew = 0.5 * jnp.sum(jnp.where(ew_active, qq * ec / r, zero))
    two_over_sqrt_pi = jnp.asarray(2.0 / math.sqrt(math.pi), dtype)
    f_ew = jnp.where(
        ew_active,
        qq * (ec / r2_ew + kappa * two_over_sqrt_pi
              * jnp.exp(-(kappa * r) ** 2) / r) / r,
        zero,
    )

    f_total = f_lj + f_ew
    forces = jnp.stack(
        [jnp.sum(f_total * dxs[d], axis=1) for d in range(3)], axis=1
    )
    return forces, e_lj, e_ew


def bond_exclusion_mask(n, bond_group):
    """Dense (N,N) bool mask of bonded pairs (for the dense pair path)."""
    import numpy as np

    mask = np.zeros((n, n), dtype=bool)
    bg = np.asarray(bond_group)
    if bg.shape[0]:
        mask[bg[:, 0], bg[:, 1]] = True
        mask[bg[:, 1], bg[:, 0]] = True
    return jnp.asarray(mask)
