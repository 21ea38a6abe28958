"""Pallas TPU kernels for the hot pair path.

``fused_pair_force_pallas`` evaluates shifted-LJ + short-range-Ewald
forces and energies in one pass over row tiles of the (N, N) pair problem,
keeping every intermediate in VMEM (one HBM read of the inputs, one write
of the outputs). Layout is TPU-native: coordinates live as (3, N) so all
pairwise arrays are (TILE, N) — lane dimension N, sublane TILE — and the
minimum-image + LJ + erfc math runs on the VPU without materializing any
(N, N, 3) displacement tensor in HBM.

This is the Pallas counterpart of :func:`cavmd_tpu.ops.lj.fused_pair_force`
(used when XLA's fusion of the jnp version is not enough); results match
the jnp path to f32 roundoff. Energies come back as per-tile partials.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def vma_struct(shape, dtype, ref):
    """``jax.ShapeDtypeStruct`` carrying ``ref``'s varying-manual-axes tag.

    Under ``shard_map(..., check_vma=True)`` (JAX 0.9+) every
    ``pallas_call`` out_shape must declare how the output varies across
    the manual mesh axes; a per-shard kernel's outputs vary exactly like
    its sharded inputs, so inherit ``jax.typeof(ref).vma``. Reduces to a
    plain struct outside shard_map or on older JAX.
    """
    try:
        vma = jax.typeof(ref).vma
    except AttributeError:
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class PallasPairPack(NamedTuple):
    """Padded static pair data for the Pallas kernel (a pytree)."""

    eps: jnp.ndarray  # (Np, Np)
    sig2: jnp.ndarray
    rcut2: jnp.ndarray
    vshift: jnp.ndarray
    lj_active: jnp.ndarray  # f32 0/1
    qq: jnp.ndarray
    ew_active: jnp.ndarray  # f32 0/1
    n_pad: int

    @staticmethod
    def create(pair, qq, coulomb_active, n, tile=128):
        np_pad = _round_up(n, tile)

        def pad2(x, fill=0.0):
            x = np.asarray(x)
            out = np.full((np_pad, np_pad), fill, dtype=np.float32)
            out[:n, :n] = x
            return jnp.asarray(out)

        eps_m, sig2_m, rcut2_m, vshift_m = pair.dense_numpy()
        return PallasPairPack(
            eps=pad2(eps_m),
            sig2=pad2(sig2_m, 1.0),
            rcut2=pad2(rcut2_m),
            vshift=pad2(vshift_m),
            lj_active=pad2(np.asarray(pair.active, np.float32)),
            qq=pad2(qq),
            ew_active=pad2(np.asarray(coulomb_active, np.float32)),
            n_pad=np_pad,
        )


jax.tree_util.register_pytree_node(
    PallasPairPack,
    lambda p: ((p.eps, p.sig2, p.rcut2, p.vshift, p.lj_active, p.qq,
                p.ew_active), p.n_pad),
    lambda aux, c: PallasPairPack(*c, n_pad=aux),
)


def _erfc_pos_parts(x):
    """(erfc(x), exp(-x^2)) for x >= 0 — Abramowitz & Stegun 7.1.26
    rational approx (abs error < 1.5e-7; Mosaic has no erfc primitive).
    The Gaussian factor is returned so callers computing the Ewald force
    (which needs exp(-x^2) again) evaluate the transcendental ONCE."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741
                                   + t * (-1.453152027 + t * 1.061405429)))
    )
    g = jnp.exp(-x * x)
    return poly * g, g


def _erfc_pos(x):
    return _erfc_pos_parts(x)[0]


def _pair_kernel(
    rows_ref, posT_ref, box_ref, eps_ref, sig2_ref, rcut2_ref, vshift_ref,
    lja_ref, qq_ref, ewa_ref, scal_ref,
    forces_ref, elj_ref, eew_ref, *, tile,
):
    i = pl.program_id(0)

    kappa = scal_ref[0, 0]
    coul_rc2 = scal_ref[0, 1]

    # row tile as (tile, 1) columns vs full row as (1, N): static slices of
    # the two precomputed layouts; no in-kernel transposes or dynamic slices
    r2 = None
    dxs = []
    for d in range(3):
        xi = rows_ref[:, d:d + 1]  # (tile, 1)
        xj = posT_ref[d:d + 1, :]  # (1, N)
        L = box_ref[0, d]
        dx = xi - xj
        dx = dx - L * jnp.round(dx / L)
        dxs.append(dx)
        r2 = dx * dx if r2 is None else r2 + dx * dx

    lja = lja_ref[...]
    ewa = ewa_ref[...]
    rcut2 = rcut2_ref[...]

    lj_on = lja * jnp.where(r2 < rcut2, 1.0, 0.0)
    ew_on = ewa * jnp.where(r2 < coul_rc2, 1.0, 0.0)
    any_on = jnp.maximum(lj_on, ew_on)
    r2_safe = r2 + (1.0 - any_on)

    # LJ
    eps = eps_ref[...]
    inv = sig2_ref[...] / r2_safe
    s6 = inv * inv * inv
    s12 = s6 * s6
    e_lj = lj_on * (4.0 * eps * (s12 - s6) - vshift_ref[...])
    f_lj = lj_on * (24.0 * eps * (2.0 * s12 - s6) / r2_safe)

    # Ewald short (erfc)
    r = jnp.sqrt(r2_safe)
    ec = _erfc_pos(kappa * r)
    qq = qq_ref[...]
    two_over_sqrt_pi = 2.0 / math.sqrt(math.pi)
    e_ew = ew_on * (qq * ec / r)
    f_ew = ew_on * (
        qq * (ec / r2_safe + kappa * two_over_sqrt_pi
              * jnp.exp(-(kappa * r) ** 2) / r) / r
    )

    f_total = f_lj + f_ew
    for d in range(3):
        forces_ref[:, d:d + 1] = jnp.sum(
            f_total * dxs[d], axis=1, keepdims=True
        )

    # sequential TPU grid: accumulate tile energies into one SMEM scalar
    @pl.when(i == 0)
    def _():
        elj_ref[0, 0] = 0.5 * jnp.sum(e_lj)
        eew_ref[0, 0] = 0.5 * jnp.sum(e_ew)

    @pl.when(i != 0)
    def _():
        elj_ref[0, 0] += 0.5 * jnp.sum(e_lj)
        eew_ref[0, 0] += 0.5 * jnp.sum(e_ew)


def pallas_pair_apply(position, box_L, pack: PallasPairPack, kappa,
                      coulomb_rcut, tile=128, interpret=False):
    """Trace-time entry: fused LJ+Ewald pair pass via the Pallas kernel.

    Callable inside an outer jit/scan (the pallas_call is constructed at
    trace time); ``kappa`` may be traced. Returns (forces (N,3), e_lj,
    e_ew) in ``position.dtype``.
    """
    run = make_fused_pair_pallas(
        pack, kappa, coulomb_rcut, tile=tile, interpret=interpret, jit=False
    )
    return run(position, box_L)


def make_fused_pair_pallas(pack: PallasPairPack, kappa, coulomb_rcut, tile=128,
                           interpret=False, jit=True):
    """Build a ``(position, box_L) -> (forces, e_lj, e_ew)`` closure."""
    np_pad = pack.n_pad
    n_tiles = np_pad // tile
    dtype = jnp.float32
    scal = jnp.stack(
        [jnp.asarray(kappa, dtype),
         jnp.asarray(coulomb_rcut, dtype) ** 2]
    ).reshape(1, 2)

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # row tile (tile, 3)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # posT (3, Np)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # box (1,3)
            *[
                pl.BlockSpec((tile, np_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(7)  # eps..ew_active row tiles
            ],
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scal (1,2)
        ],
        out_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # forces
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
    )

    kernel = functools.partial(_pair_kernel, tile=tile)
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((np_pad, 3), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        interpret=interpret,
    )

    def run(position, box_L):
        n = position.shape[0]
        rows = jnp.zeros((np_pad, 3), dtype).at[:n].set(
            position.astype(dtype)
        )
        posT = rows.T
        box = jnp.asarray(box_L, dtype).reshape(1, 3)
        forces, elj, eew = call(
            rows, posT, box, pack.eps, pack.sig2, pack.rcut2, pack.vshift,
            pack.lj_active, pack.qq, pack.ew_active, scal,
        )
        return (
            forces[:n].astype(position.dtype),
            jnp.sum(elj).astype(position.dtype),
            jnp.sum(eew).astype(position.dtype),
        )

    return jax.jit(run) if jit else run


# ---------------------------------------------------------------------------
# Fused LJ + Ewald-short CELL kernel (large N)
# ---------------------------------------------------------------------------
#
# The XLA cell-tile path (ops/neighbor.py:cell_pair_force) materializes
# several (cells, cap, 27cap) intermediates to HBM per step — measured
# ~37 ms of the 51 ms step at N=100k on v5e. This kernel computes the whole
# tile pipeline per cell in VMEM: one HBM read of the (pre-gathered) i/j
# tiles, one write of the per-cell force rows.
#
# Layouts (all built in XLA per step from the carried CellList — gathers
# are memory-bound and XLA does them well; the kernel does the flop-dense
# part):
#   Pi (C, cap, R)      i-side feature rows, R = [x y z q id onehots excl*]
#   Pj (C, R, 27cap_p)  j-side candidates, lane-padded to a 128 multiple
#   out (C, cap, 8)     rows [fx fy fz e_lj_i e_ew_i 0 0 0]
# Mosaic constraints respected (measured round 1): no erfc primitive (A&S
# approx), no dynamic slices of VMEM inputs (every slice below is static),
# no in-kernel transposes (i-columns come from a lane reduction against a
# static one-hot).


class CellPallasPack(NamedTuple):
    """Static per-particle rows + expansion tables for the cell kernel."""

    static_rows: jnp.ndarray  # (N+1, R-3): q, id, param rows, exclusion ids
    eps_terms: tuple  # ((t, u, eps_tu), ...) nonzero type-pair entries
    sig2_terms: tuple
    n_types_active: int  # count of per-particle param rows (one-hots OR g_k)
    max_excl: int
    r_pad: int  # padded row count R
    lam: tuple = None  # factored LJ: eps(i,j) = sum_k lam_k g_k[i] g_k[j]

    @staticmethod
    def create(typeid, charge, eps_table, sigma_table, exclusions, n):
        """Build from concrete (host) values at ForceField.create time.

        ``exclusions``: (N+1, max_excl) int table (sentinel n).
        Active types = types with any nonzero eps row/col (the photon and
        ghost types are inert and need no param row).

        LJ type-pair parameters ride per-particle rows in one of two
        exact representations:

        - **factored** (``lam`` set): simultaneous congruence
          diagonalization of the two symmetric active-type tables. With
          S = chol L, M = L^-1 E L^-T = Q diag(lam) Q^T, G = L Q:
          G G^T = S (sig^2 table) and G diag(lam) G^T = E (eps table),
          so per-particle scalars g_k[i] = G[type_i, k] reconstruct BOTH
          tables from shared products m_k = g_k[i] g_k[j]:
          sig2(i,j) = sum_k m_k and eps(i,j) = sum_k lam_k m_k — 5 VPU
          ops per pair slot instead of 3 per nonzero type-pair entry
          (12 at two types), at the same row count as the one-hots.
        - **one-hot** (``lam`` None): fallback when the sig^2 table is
          not positive definite on the active types (e.g. a zero-sigma
          pair) or the f32-rounded factorization fails to reproduce the
          tables to ~1e-6 relative.
        """
        eps_np = np.asarray(eps_table, np.float64)
        sig_np = np.asarray(sigma_table, np.float64)
        excl_np = np.asarray(exclusions, np.int64)
        typeid_np = np.asarray(typeid)
        q_np = np.asarray(charge, np.float32)
        active = sorted(
            set(np.nonzero(eps_np.any(axis=1))[0])
            | set(np.nonzero(eps_np.any(axis=0))[0])
        )
        ta = len(active)
        max_excl = excl_np.shape[1]
        r = 3 + 1 + 1 + ta + max_excl
        r_pad = r  # lane dim of Pj blocks handles its own padding

        sig2 = sig_np * sig_np
        e_act = eps_np[np.ix_(active, active)] if ta else np.zeros((0, 0))
        s_act = sig2[np.ix_(active, active)] if ta else np.zeros((0, 0))
        lam, g_cols = _factor_lj_tables(e_act, s_act)

        rows = np.zeros((n + 1, r - 3), np.float32)
        rows[:n, 0] = q_np[:n]
        rows[:, 1] = np.arange(n + 1, dtype=np.float32)  # id; sentinel = n
        for a, t in enumerate(active):
            sel = typeid_np == t
            if lam is None:
                rows[:n, 2 + a] = sel.astype(np.float32)
            else:
                for k in range(ta):
                    rows[:n, 2 + k][sel] = g_cols[a, k]
        # exclusion partner ids (sentinel n matches nothing real)
        rows[:, 2 + ta:2 + ta + max_excl] = excl_np.astype(np.float32)

        eps_terms, sig2_terms = [], []
        for a, t in enumerate(active):
            for b, u in enumerate(active):
                if eps_np[t, u] != 0.0:
                    eps_terms.append((a, b, float(eps_np[t, u])))
                    sig2_terms.append((a, b, float(sig2[t, u])))
        return CellPallasPack(
            static_rows=jnp.asarray(rows),
            eps_terms=tuple(eps_terms),
            sig2_terms=tuple(sig2_terms),
            n_types_active=ta,
            max_excl=max_excl,
            r_pad=r_pad,
            lam=lam,
        )


def _factor_lj_tables(e_act, s_act):
    """Exact joint factorization of the (eps, sig^2) active-type tables.

    Returns ``(lam, G)`` with ``G @ G.T == s_act`` and
    ``G @ diag(lam) @ G.T == e_act``, or ``(None, None)`` when the
    factored form is unavailable (sig^2 not PD) or loses accuracy after
    f32 rounding of the per-particle factors.
    """
    ta = e_act.shape[0]
    if ta == 0 or os.environ.get("CAVMD_LJ_FACTORED") == "0":
        # kill switch for A/B benchmarks of the one-hot fallback
        return None, None
    try:
        chol = np.linalg.cholesky(s_act)
    except np.linalg.LinAlgError:
        return None, None
    m_mat = np.linalg.solve(chol, np.linalg.solve(chol, e_act).T).T
    lam_v, q_mat = np.linalg.eigh(0.5 * (m_mat + m_mat.T))
    g_cols = chol @ q_mat
    scale_s = np.abs(s_act).max() or 1.0
    scale_e = np.abs(e_act).max() or 1.0
    # cancellation headroom: a near-singular S yields huge |lam| whose
    # terms cancel — exact in f64 but catastrophic in the kernel's f32
    # accumulation. Reject before the roundoff check even bothers.
    if np.abs(lam_v).max() * scale_s > 1e3 * scale_e:
        return None, None
    # reconstruct exactly the way the kernel will: f32 factors, f32
    # eigenvalues, f32 products and sums
    g32 = g_cols.astype(np.float32)
    lam32 = lam_v.astype(np.float32)
    s_rec = (g32 @ g32.T).astype(np.float64)
    e_rec = (g32 @ np.diag(lam32) @ g32.T).astype(np.float64)
    if (np.abs(s_rec - s_act).max() > 1e-6 * scale_s
            or np.abs(e_rec - e_act).max() > 1e-6 * scale_e):
        return None, None
    return tuple(float(v) for v in lam_v), g_cols


jax.tree_util.register_pytree_node(
    CellPallasPack,
    lambda p: ((p.static_rows,),
               (p.eps_terms, p.sig2_terms, p.n_types_active, p.max_excl,
                p.r_pad, p.lam)),
    lambda aux, c: CellPallasPack(c[0], *aux),
)


def _fused_tile(pi, jrow, scal_ref, pack: "CellPallasPack", rc2, wrap=True,
                reduce=True):
    """One (cap_i x L_j) fused LJ + Ewald-short tile, all in registers/VMEM.

    ``pi``: (cap, R) i-side rows (already read). ``jrow(row)``: (1, L)
    j-side feature row for feature index ``row``. Returns the five per-i
    reductions ((cap,1) each): fx, fy, fz, e_lj, e_ew.

    ``wrap=False`` skips the per-pair minimum-image rounding: the caller
    guarantees i/j coordinates are already in mutually-nearest images
    (cell-local positions + pre-shifted neighbor copies, see
    :func:`fused_cell_cols_pallas`) — 9 VPU ops/pair saved across the
    whole padded tile. ``wrap="z"`` rounds only the z component (the
    z-sorted column layout pre-shifts xy via the halo but keeps the
    periodic z axis live, see :func:`fused_zsort_cols_pallas`).
    """
    ta = pack.n_types_active
    kappa = scal_ref[0, 0]
    n_real = scal_ref[0, 4]
    two_over_sqrt_pi = 2.0 / math.sqrt(math.pi)
    wrap_dims = (0, 1, 2) if wrap is True else ((2,) if wrap == "z" else ())

    def icol(row):  # (cap, 1) column — static slice
        return pi[:, row:row + 1]

    # component-wise min-image displacements (box rides SMEM scalars).
    # Divides are ~10x a multiply on the VPU: reciprocal-multiplies
    # (the scalar 1/L divides hoist out of the tile).
    r2 = None
    dxs = []
    for d in range(3):
        dx = icol(d) - jrow(d)
        if d in wrap_dims:
            L = scal_ref[0, 1 + d]
            dx = dx - L * jnp.round(dx * (1.0 / L))
        dxs.append(dx)
        r2 = dx * dx if r2 is None else r2 + dx * dx

    # pair activity: in cutoff, both real (id < n — empty slots sit at
    # a far position that can wrap onto a real/padded coordinate and
    # produce an exact r2 = 0, whose 0/0 would poison the energy
    # sums), not self, not excluded.
    id_i = icol(4)
    id_j = jrow(4)
    # one vmask chain + a single select instead of a per-condition
    # select+multiply ladder (the two id bounds fold into one compare on
    # max(id_i, id_j)); same truth table, same 0.0/1.0 float mask, so
    # every downstream product is bit-identical
    ok = (r2 < rc2) & (id_i != id_j) & (jnp.maximum(id_i, id_j) < n_real)
    for e in range(pack.max_excl):
        ex_i = icol(5 + ta + e)
        ok = ok & (ex_i != id_j)
    valid = jnp.where(ok, 1.0, 0.0)

    r2_safe = r2 + (1.0 - valid)

    # per-pair LJ parameters from per-particle rows (both exact):
    # factored (shared products m_k reconstruct sig2 AND eps — see
    # CellPallasPack.create) or the one-hot type-pair expansion fallback
    eps = None
    s2 = None
    if pack.lam is not None:
        for k, lam_k in enumerate(pack.lam):
            m = icol(5 + k) * jrow(5 + k)
            s2 = m if s2 is None else s2 + m
            eps = lam_k * m if eps is None else eps + lam_k * m
    else:
        for (a, b, v), (_, _, s2v) in zip(pack.eps_terms, pack.sig2_terms):
            h = icol(5 + a) * jrow(5 + b)
            eps = v * h if eps is None else eps + v * h
            s2 = s2v * h if s2 is None else s2 + s2v * h
    if eps is None:
        eps = jnp.zeros_like(r2)
        s2 = jnp.zeros_like(r2)

    # one rsqrt covers every reciprocal below (divides are the
    # dominant per-pair cost otherwise)
    inv_r = jax.lax.rsqrt(r2_safe)
    inv_r2 = inv_r * inv_r
    rr = r2_safe * inv_r

    inv = s2 * inv_r2
    s6 = inv * inv * inv
    s12 = s6 * s6
    # inline shift under the uniform cutoff: (sigma/rc)^6 = s2^3/rc^6
    src6 = (s2 * s2 * s2) * (1.0 / (rc2 * rc2 * rc2))
    e_lj = valid * (4.0 * eps * (s12 - s6 - (src6 * src6 - src6)))
    f_lj = valid * (24.0 * eps * (2.0 * s12 - s6) * inv_r2)

    qq = icol(3) * jrow(3)
    x = kappa * rr
    ec, gauss = _erfc_pos_parts(x)  # one exp serves erfc AND the force
    e_ew = valid * (qq * ec * inv_r)
    f_ew = valid * (
        qq * (ec * inv_r2 + kappa * two_over_sqrt_pi
              * gauss * inv_r) * inv_r
    )

    f = f_lj + f_ew
    if not reduce:
        # unreduced (rows, L) partials — small-tile callers accumulate
        # them in VMEM scratch across a window and reduce ONCE per
        # i-block (per-tile lane reductions dominate at (16,128) tiles)
        return f * dxs[0], f * dxs[1], f * dxs[2], e_lj, e_ew
    return (
        jnp.sum(f * dxs[0], axis=1, keepdims=True),
        jnp.sum(f * dxs[1], axis=1, keepdims=True),
        jnp.sum(f * dxs[2], axis=1, keepdims=True),
        jnp.sum(e_lj, axis=1, keepdims=True),
        jnp.sum(e_ew, axis=1, keepdims=True),
    )


def _cell_kernel(pi_ref, pj_ref, scal_ref, out_ref, *, pack: "CellPallasPack",
                 rc2, cells_per_step):
    """G cells per grid step: each an (cap_i x 27cap_j) fused LJ +
    Ewald-short tile computed entirely in VMEM. Multiple cells per step
    amortize the per-grid-iteration overhead (4913 single-cell steps were
    overhead-bound, measured)."""
    cap = pi_ref.shape[1]

    for g in range(cells_per_step):
        pi = pi_ref[g]  # (cap, R)

        def jrow(row):  # (1, 27cap_p) — static slice
            return pj_ref[g, row:row + 1, :]

        fx, fy, fz, e_lj, e_ew = _fused_tile(pi, jrow, scal_ref, pack, rc2)
        out_ref[g, :, 0:1] = fx
        out_ref[g, :, 1:2] = fy
        out_ref[g, :, 2:3] = fz
        out_ref[g, :, 3:4] = e_lj
        out_ref[g, :, 4:5] = e_ew
        out_ref[g, :, 5:8] = jnp.zeros((cap, 3), jnp.float32)


def _xy_neighbor_table(cx, cy) -> np.ndarray:
    """(cx*cy, 9) wrapped xy-neighbor column ids (host-side, trace-time)."""
    return _xy_neighbor_table_shifts(cx, cy)[0]


def _xy_neighbor_table_shifts(cx, cy):
    """Neighbor column ids PLUS their box-wrap counts.

    Returns ``(table (XY, 9) int32, wraps (XY, 9, 2) int32)``: fetching
    neighbor column ``table[c, k]`` for column ``c`` crosses the periodic
    x/y boundary ``wraps[c, k, :]`` times — the fetched copy's coordinates
    must be shifted by ``wraps * box_L`` to sit in column ``c``'s image
    (the pre-wrapped layout that lets the kernel skip per-pair min-image).
    """
    ids = np.arange(cx * cy)
    x, y = ids // cy, ids % cy
    out = np.empty((cx * cy, 9), np.int32)
    wraps = np.empty((cx * cy, 9, 2), np.int32)
    k = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            out[:, k] = ((x + dx) % cx) * cy + (y + dy) % cy
            wraps[:, k, 0] = np.floor_divide(x + dx, cx)
            wraps[:, k, 1] = np.floor_divide(y + dy, cy)
            k += 1
    return out, wraps


def cell_local_positions(position, box_L, clist, cfg):
    """The image of each particle nearest its bucket cell's center.

    Between rebuilds a particle can drift across the box boundary and
    re-wrap (position jumps by L while its bucket stays) — per-pair
    min-image absorbs that in the tile. The pre-wrapped layout instead
    normalizes ONCE per particle per step (3 rounds on N rows, vs 3 rounds
    on every padded pair slot): after this, every particle's coordinate is
    within skin/2 of its cell's primary-image bounds, so neighbor-copy
    shifts by whole box lengths make all in-neighborhood displacements
    exact without rounding.
    """
    dtype = position.dtype
    C, cap = clist.bucket_idx.shape
    cx, cy, cz = cfg.ncells
    cell = jnp.minimum(clist.slot_of // cap, C - 1)  # dump slot -> clamp
    z = cell % cz
    y = (cell // cz) % cy
    x = cell // (cy * cz)
    box = jnp.asarray(box_L, dtype)
    ncells = jnp.asarray([cx, cy, cz], dtype)
    frac = (jnp.stack([x, y, z], axis=-1).astype(dtype) + 0.5) / ncells
    center = (frac - 0.5) * box
    off = position - center
    return center + off - box * jnp.round(off / box)


def _sentinel_tail(buf_ref, r, start, n_real):
    """Fill buffer lanes [start:] with sentinel rows: far position
    (rows 0-2), id n (row 4), zeros elsewhere — pairs against them fail
    the validity mask instead of aliasing particle 0 at the origin."""
    tail = buf_ref.shape[1] - start
    buf_ref[:, start:] = jnp.zeros((r, tail), jnp.float32)
    buf_ref[0:3, start:] = jnp.full((3, tail), 1e6, jnp.float32)
    buf_ref[4:5, start:] = jnp.broadcast_to(n_real, (1, tail))


def _cell_cols_kernel(pi_ref, pj_ref, occ_ref, scal_ref, out_ref, elj_ref,
                      eew_ref, jbuf_ref, *, pack: "CellPallasPack", rc2, cz,
                      cap, lanes_pad, s1, wrap=False):
    """One xy column of cells per grid step (z-resident j-tiles).

    ``pi_ref``: (1, cz, cap, R) i-side rows for the column's cells.
    ``pj_ref``: (1, 9, R, (cz+2)*cap_pad) — the 9 xy-neighbor columns,
    feature-major with the z-HALO'd cell axis in lanes. For cell iz the
    27-cell neighborhood is the 9 lane windows [iz*cap, (iz+3)*cap) (halo
    offset +1 makes the dz=-1..1 window start at iz*cap). The windows are
    assembled into ``jbuf_ref`` (R, 27cap_pad) — static lane-slice copies,
    register shuffles only — and the tile body is shared with the
    gather-based kernel (:func:`_fused_tile`).

    Occupancy-predicated i-rows (the two-tier cap-padding fix): bucket
    capacity is sized for the max-occupancy cell (+drift margin), but the
    MEAN occupancy is ~half that — uniform cap wastes >40% of the tile
    compute on empty i-slots (measured; VERDICT r2). Tier 1 computes
    slots [0:s1] for every cell; tier 2 computes slots [s1:cap] only when
    ``occ_ref`` says the cell actually fills them (a scalar ``pl.when``
    branch — the sparse tail of the occupancy distribution). Per-row
    arithmetic and lane-reduction order are unchanged, so FORCES are
    bit-identical to the single-pass kernel. Energies accumulate into
    the ``elj_ref``/``eew_ref`` SMEM scalars across tiles and grid steps
    (the :func:`_pair_kernel` pattern) instead of writing per-row energy
    columns: summing the (C, cap) energy channels outside the kernel
    cost ~0.34 ms/step of full-output slice-reduce at N=100k (xprof).
    The scalar sum groups per (tier, cell) rather than one array-wide
    tree, so energies agree with the old path to f32 rounding, not
    bitwise.
    """
    n_real = scal_ref[0, 4]
    w = 3 * cap
    tail = lanes_pad - 27 * cap
    r = pack.r_pad

    @pl.when(pl.program_id(0) == 0)
    def _():
        elj_ref[0, 0] = 0.0
        eew_ref[0, 0] = 0.0

    for iz in range(cz):
        if tail and iz == 0:
            _sentinel_tail(jbuf_ref, r, 27 * cap, n_real)
        for k in range(9):
            jbuf_ref[:, k * w:(k + 1) * w] = (
                pj_ref[0, k, :, iz * cap:iz * cap + w]
            )
        pi = pi_ref[0, iz]  # (cap, R)

        def jrow(row):  # (1, 27cap_pad) — static slice
            return jbuf_ref[row:row + 1, :]

        def tile_rows(lo, hi):
            # wrap=False when the caller pre-shifted every neighbor copy
            # into this column's image (cell_local_positions + halo/xy
            # shifts); wrap=True for raw-position callers (the slab
            # variant) — per-pair min-image instead
            fx, fy, fz, e_lj, e_ew = _fused_tile(
                pi[lo:hi], jrow, scal_ref, pack, rc2, wrap=wrap
            )
            out_ref[0, iz, lo:hi, 0:1] = fx
            out_ref[0, iz, lo:hi, 1:2] = fy
            out_ref[0, iz, lo:hi, 2:3] = fz
            out_ref[0, iz, lo:hi, 3:8] = jnp.zeros((hi - lo, 5), jnp.float32)
            elj_ref[0, 0] += jnp.sum(e_lj)
            eew_ref[0, 0] += jnp.sum(e_ew)

        tile_rows(0, s1)
        if s1 < cap:
            occ = occ_ref[pl.program_id(0), iz]

            @pl.when(occ > s1)
            def _():
                tile_rows(s1, cap)

            @pl.when(occ <= s1)
            def _():
                # skipped tail slots hold no particles; the force gather
                # can read any row, so keep the tail defined
                out_ref[0, iz, s1:, :] = jnp.zeros((cap - s1, 8),
                                                   jnp.float32)


def _cell_cols_kernel_jsplit(pi_ref, pjA_ref, pjB_ref, occ_ref, flag_ref,
                             scal_ref, out_ref, elj_ref, eew_ref,
                             jbufA_ref, jbufB_ref, *,
                             pack: "CellPallasPack", rc2, cz, cap, cap1,
                             lanes_padA, lanes_padB, s1, wrap=False):
    """Two-capacity-class j-window variant of :func:`_cell_cols_kernel`.

    The bucket cap is sized for the max-occupancy cell plus drift margin
    (45 at N=100k) but the occupancy distribution's bulk sits far below
    it (mean 20.4, sigma 4.2) — the two-tier i-row split fixed the i-side
    of that padding, yet every tile still swept 27*cap j-LANES. Here the
    j-side candidates split at slot ``cap1`` (~mean + 2.6 sigma): class A
    (slots [0:cap1]) is computed for every cell; class B (slots
    [cap1:cap]) only where ``flag_ref`` says some cell of the 27-cell
    neighborhood actually overflows cap1 — 16% of cells at N=100k
    (measured; bucket occupancy is carried, so the flag is static between
    rebuilds). The padded lane window drops from 27*cap (1280 at cap 45)
    to ~27*cap1 + P(flag)*27*(cap-cap1) (~960 effective).

    Class-B contributions ACCUMULATE into the already-written out rows
    (VMEM read-modify-write), so forces regroup (A-sum + B-sum) and agree
    with the single-window kernel to f32 rounding, not bitwise — the
    same accuracy class as the SMEM energy regrouping.
    """
    n_real = scal_ref[0, 4]
    cap2 = cap - cap1
    wA, wB = 3 * cap1, 3 * cap2
    r = pack.r_pad
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        elj_ref[0, 0] = 0.0
        eew_ref[0, 0] = 0.0

    for iz in range(cz):
        if iz == 0:
            if lanes_padA != 27 * cap1:
                _sentinel_tail(jbufA_ref, r, 27 * cap1, n_real)
            if lanes_padB != 27 * cap2:
                _sentinel_tail(jbufB_ref, r, 27 * cap2, n_real)
        for k in range(9):
            jbufA_ref[:, k * wA:(k + 1) * wA] = (
                pjA_ref[0, k, :, iz * cap1:iz * cap1 + wA]
            )
        pi = pi_ref[0, iz]  # (cap, R)
        occ = occ_ref[c, iz]
        flag = flag_ref[c, iz]

        def jrowA(row):  # (1, lanes_padA) — static slice
            return jbufA_ref[row:row + 1, :]

        def jrowB(row):  # (1, lanes_padB) — static slice
            return jbufB_ref[row:row + 1, :]

        def tile_a(lo, hi):
            fx, fy, fz, e_lj, e_ew = _fused_tile(
                pi[lo:hi], jrowA, scal_ref, pack, rc2, wrap=wrap
            )
            out_ref[0, iz, lo:hi, 0:1] = fx
            out_ref[0, iz, lo:hi, 1:2] = fy
            out_ref[0, iz, lo:hi, 2:3] = fz
            out_ref[0, iz, lo:hi, 3:8] = jnp.zeros((hi - lo, 5), jnp.float32)
            elj_ref[0, 0] += jnp.sum(e_lj)
            eew_ref[0, 0] += jnp.sum(e_ew)

        def tile_b_add(lo, hi):
            fx, fy, fz, e_lj, e_ew = _fused_tile(
                pi[lo:hi], jrowB, scal_ref, pack, rc2, wrap=wrap
            )
            out_ref[0, iz, lo:hi, 0:1] += fx
            out_ref[0, iz, lo:hi, 1:2] += fy
            out_ref[0, iz, lo:hi, 2:3] += fz
            elj_ref[0, 0] += jnp.sum(e_lj)
            eew_ref[0, 0] += jnp.sum(e_ew)

        tile_a(0, s1)
        if s1 < cap:
            @pl.when(occ > s1)
            def _():
                tile_a(s1, cap)

            @pl.when(occ <= s1)
            def _():
                out_ref[0, iz, s1:, :] = jnp.zeros((cap - s1, 8),
                                                   jnp.float32)

        @pl.when(flag > 0)
        def _():
            for k in range(9):
                jbufB_ref[:, k * wB:(k + 1) * wB] = (
                    pjB_ref[0, k, :, iz * cap2:iz * cap2 + wB]
                )
            tile_b_add(0, s1)

        if s1 < cap:
            @pl.when((flag > 0) & (occ > s1))
            def _():
                tile_b_add(s1, cap)


def fused_cell_cols_pallas(position, box_L, clist, cfg, pack: CellPallasPack,
                           kappa, interpret=False, s1=None, jsplit=None):
    """Column-resident variant of :func:`fused_cell_pallas` (round 2).

    Same tile math, different data movement: instead of gathering a
    (C, 27, cap, R) j-tensor by neighbor-cell id and relaying it out to
    (C, R, 27cap) — measured 9-10 ms/step of XLA gather+transpose traffic
    at N=100k — the per-cell rows are stored once per step as z-HALO'd
    xy-columns (XY, R, (cz+2)*cap) with the cell-z axis *in the lane
    dimension*. The j-side fetch is then a gather of only the 9 wrapped
    xy-neighbor columns (contiguous ~32 KB rows, bandwidth-efficient) and
    each fetched column serves ALL cz cells of the grid step — the
    27-cell window per cell is 9 static lane slices done in-kernel.
    HBM j-traffic drops from ~27x to ~9x the cell-row bytes and the
    transpose happens once on the compact (C, cap, R) array.

    Round-3 structural fixes to the cap-padding waste (VERDICT r2):

    - **pre-wrapped images** — particle coordinates are normalized to
      their bucket cell's image once per step (``cell_local_positions``)
      and halo/neighbor copies are shifted by whole box lengths, so the
      kernel computes plain ``xi - xj`` with NO per-pair min-image
      rounding (~9 of ~65 VPU ops per padded pair slot). Exact for every
      in-cutoff pair: disagreements with min-image can only occur at
      distance >= cell width > r_cut.
    - **occupancy-predicated two-tier i-rows** (``s1``, see
      :func:`_cell_cols_kernel`): tile rows beyond the occupancy bulk run
      only for the cells that need them.
    - **two-capacity-class j-windows** (``jsplit``, see
      :func:`_cell_cols_kernel_jsplit`): the j-lane window splits at slot
      ``cap1``; the tail class runs only for cells whose 27-cell
      neighborhood overflows cap1. ``jsplit=None`` auto-picks
      cap1 ~ mean + 2.6 sigma (8-aligned); ``jsplit=0`` disables (one
      window, the round-2 behavior — forces then bit-match any ``s1``).

    Requires >= 3 cells per axis (no wrapped-neighbor duplicates);
    callers fall back to :func:`fused_cell_pallas` otherwise.
    """
    n = position.shape[0]
    dtype = jnp.float32
    idx = clist.bucket_idx  # (C, cap)
    C, cap = idx.shape
    cx, cy, cz = cfg.ncells
    assert min(cx, cy, cz) >= 3, "cols kernel needs >=3 cells per axis"
    XY = cx * cy
    r = pack.r_pad

    mean_occ = n / max(C, 1)
    # j-window split slot: the occupancy bulk's upper edge (mean + 2.6
    # sigma floored to 8 — cap1=32 at N=100k, where 0.7% of cells and 16%
    # of 27-neighborhoods overflow it; measured histogram in
    # docs/performance.md). Disabled when the tail class would be thinner
    # than 8 slots (the predicated copies stop paying for themselves).
    if jsplit is None:
        cap1 = int((mean_occ + 2.6 * np.sqrt(mean_occ)) // 8) * 8
    else:
        cap1 = int(jsplit)
    cap1 = max(0, min(cap1, cap))
    split = cap1 >= 8 and (cap - cap1) >= 8

    far = jnp.full((1, 3), jnp.asarray(1e6, dtype))
    # pre-wrapped layout: cell-local particle images (one normalization on
    # N rows) + whole-box shifts on the halo/neighbor copies below let the
    # kernel drop per-pair min-image rounding entirely (wrap=False)
    pos_local = cell_local_positions(position.astype(dtype), box_L, clist,
                                     cfg)
    pos_pad = jnp.concatenate([pos_local, far])  # (N+1, 3)
    rows = jnp.concatenate([pos_pad, pack.static_rows], axis=1)  # (N+1, R)

    pi = rows[idx].reshape(XY, cz, cap, r)  # i-side column blocks

    # j source: z-halo (wrap copies pre-shifted by -/+ Lz), then
    # feature-major with z*cap lanes
    box_f = jnp.asarray(box_L, dtype)
    z_shift = jnp.zeros((1, 1, 1, r), dtype).at[0, 0, 0, 2].set(1.0)
    zh = jnp.concatenate([
        pi[:, -1:] - box_f[2] * z_shift,
        pi,
        pi[:, :1] + box_f[2] * z_shift,
    ], axis=1)  # (XY, cz+2, cap, r)
    xy_nb_np, xy_wraps_np = _xy_neighbor_table_shifts(cx, cy)
    xy_nb = jnp.asarray(xy_nb_np, jnp.int32)
    # pre-shift the wrapped neighbor copies into this column's image:
    # (XY, 9, r, 1) tensor, nonzero only on the x/y position rows at
    # box-edge columns; one fused broadcast add over the gather output
    wraps = jnp.asarray(xy_wraps_np, dtype)  # (XY, 9, 2)
    row_x = jnp.zeros((r,), dtype).at[0].set(1.0)
    row_y = jnp.zeros((r,), dtype).at[1].set(1.0)
    xy_shift = (
        (wraps[..., 0] * box_f[0])[:, :, None, None]
        * row_x[None, None, :, None]
        + (wraps[..., 1] * box_f[1])[:, :, None, None]
        * row_y[None, None, :, None]
    )

    def halo_cols(zh_slice, cap_x):
        """(XY, cz+2, cap_x, r) slot-slice -> (XY, 9, r, zcap_pad)
        feature-major neighbor columns with sentinel lane padding."""
        zcap = (cz + 2) * cap_x
        zcap_pad = _round_up(zcap, 128)
        jsrc = jnp.transpose(zh_slice, (0, 3, 1, 2)).reshape(XY, r, zcap)
        if zcap_pad != zcap:
            sent_col = (
                jnp.zeros((r,), dtype).at[:3].set(1e6).at[4].set(float(n))
            )
            pad = jnp.broadcast_to(
                sent_col[None, :, None], (XY, r, zcap_pad - zcap)
            )
            jsrc = jnp.concatenate([jsrc, pad], axis=2)
        return jsrc[xy_nb] + xy_shift, zcap_pad

    box = jnp.asarray(box_L, dtype).reshape(3)
    scal = jnp.concatenate(
        [jnp.asarray(kappa, dtype).reshape(1), box,
         jnp.asarray(float(n), dtype).reshape(1)]
    ).reshape(1, 5)
    rc2 = float(cfg.r_cut) ** 2

    # two-tier i-row split point: cover the occupancy distribution's bulk
    # (mean + ~1 sigma, 8-row sublane aligned); the tail runs under the
    # per-cell occupancy predicate. s1 = cap disables tier 2.
    if s1 is None:
        # floor-to-8 of mean + 1 sigma: measured optimum at N=100k
        # (occ mean 20.4 -> s1=24: 7.7 ms vs 8.5 at 32, 10.1 single-tier)
        s1 = int((mean_occ + np.sqrt(mean_occ)) // 8) * 8
    s1 = max(8, min(int(s1), cap))
    occ = jnp.sum(idx < n, axis=1, dtype=jnp.int32).reshape(XY, cz)

    common_out = dict(
        out_specs=[
            pl.BlockSpec((1, cz, cap, 8), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((XY, cz, cap, 8), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        interpret=interpret,
    )

    if split:
        cap2 = cap - cap1
        lanes_padA = _round_up(27 * cap1, 128)
        lanes_padB = _round_up(27 * cap2, 128)
        pjA, zcapA_pad = halo_cols(zh[:, :, :cap1], cap1)
        pjB, zcapB_pad = halo_cols(zh[:, :, cap1:], cap2)
        # class-B predicate per (column, z-cell): does ANY cell of the
        # 27-cell neighborhood overflow cap1? Bucket occupancy is carried
        # between rebuilds, so this is a static per-step scalar table.
        occ_nb = jnp.max(occ[xy_nb], axis=1)  # (XY, cz) 9-column max
        over = jnp.maximum(
            jnp.maximum(jnp.roll(occ_nb, 1, axis=1), occ_nb),
            jnp.roll(occ_nb, -1, axis=1),
        )  # periodic z window max
        flag = (over > cap1).astype(jnp.int32)

        kernel = functools.partial(
            _cell_cols_kernel_jsplit, pack=pack, rc2=rc2, cz=cz, cap=cap,
            cap1=cap1, lanes_padA=lanes_padA, lanes_padB=lanes_padB, s1=s1,
        )
        out = pl.pallas_call(
            kernel,
            grid=(XY,),
            in_specs=[
                pl.BlockSpec((1, cz, cap, r), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 9, r, zcapA_pad), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 9, r, zcapB_pad), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # (XY, cz) occupancy
                pl.BlockSpec(memory_space=pltpu.SMEM),  # (XY, cz) B flag
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[pltpu.VMEM((r, lanes_padA), jnp.float32),
                            pltpu.VMEM((r, lanes_padB), jnp.float32)],
            **common_out,
        )(pi, pjA, pjB, occ, flag, scal)
    else:
        lanes_pad = _round_up(27 * cap, 128)
        pj, zcap_pad = halo_cols(zh, cap)
        kernel = functools.partial(_cell_cols_kernel, pack=pack, rc2=rc2,
                                   cz=cz, cap=cap, lanes_pad=lanes_pad,
                                   s1=s1)
        out = pl.pallas_call(
            kernel,
            grid=(XY,),
            in_specs=[
                pl.BlockSpec((1, cz, cap, r), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 9, r, zcap_pad), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # (XY, cz) occupancy
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[pltpu.VMEM((r, lanes_pad), jnp.float32)],
            **common_out,
        )(pi, pj, occ, scal)
    out, elj, eew = out

    from cavmd_tpu.ops.neighbor import slot_gather_forces

    forces = slot_gather_forces(out.reshape(C, cap, 8), clist, n)
    e_lj = 0.5 * elj[0, 0]
    e_ew = 0.5 * eew[0, 0]
    return (forces.astype(position.dtype),
            e_lj.astype(position.dtype), e_ew.astype(position.dtype))


def _xy_neighbor_table_slab(cx_ext, cy):
    """(own-XY, 9) neighbor column ids + y-wrap signs over a slab grid.

    Own columns are ext x-layers 1..cx_ext-2 (the edge layers are halo,
    j-only); x never wraps — the halo layers stand in for the remote /
    periodic x images — while y wraps as usual. Returns ``(ids, ywrap)``
    where ``ywrap`` in {-1, 0, +1} marks neighbor columns fetched across
    the periodic y edge: the raw-position caller ignores it (per-pair
    min-image), the pre-wrapped caller turns it into a +-Ly shift tensor
    (x shifts are never needed — the pre-wrap normalizes halo rows
    against VIRTUAL cell centers that continue past the slab edge, so
    the periodic x image is already folded into the coordinates).
    """
    cxo = cx_ext - 2
    ids = np.arange(cxo * cy)
    x, y = ids // cy + 1, ids % cy
    out = np.empty((cxo * cy, 9), np.int32)
    ywrap = np.zeros((cxo * cy, 9), np.int32)
    k = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            yn = y + dy
            out[:, k] = (x + dx) * cy + yn % cy
            # same convention as _xy_neighbor_table_shifts: the fetched
            # copy's coordinates must be shifted by ywrap * Ly
            ywrap[:, k] = np.floor_divide(yn, cy)
            k += 1
    return out, ywrap


def fused_cell_cols_slab_pallas(position, box_L, clist, cfg,
                                pack: CellPallasPack, kappa,
                                interpret=False, s1=None, jsplit=None,
                                mean_occ=None, cell_ctr=None):
    """Column-resident cols kernel over a slab-extended local grid.

    The domain-decomposed pipeline's tile pass (``parallel/domain.py``):
    ``cfg.ncells = (cxl+2, cy, cz)`` where ext x-layers 0 and cxl+1 hold
    j-only halo copies of the x-neighbor shards' edge layers. Same tile
    math and two-tier/jsplit predication as
    :func:`fused_cell_cols_pallas`, with three slab deltas:

    - i-columns span only the OWN x-layers (1..cxl); halo columns are
      fetched as j-neighbors and never compute, so each cross-shard pair
      is counted once per owning shard and the 0.5x sum stands after the
      runner's energy psum.
    - positions are RAW by default (halo copies keep the sender's
      coordinates): the tile runs per-pair min-image (``wrap=True``),
      which also absorbs the +-L images at box-edge shards and the y/z
      wraps — no pre-wrapped layout or shift tensors. Costs ~9 VPU
      ops/pair-slot vs the pre-wrapped single-shard kernel.
    - ``cell_ctr`` (round 5): optional (n, 3) assigned-cell centers
      (residents + halos) switching to the PRE-WRAPPED layout: each row
      is normalized once per step to the image nearest its own cell
      center (``ctr + min_image(pos - ctr)``), the z-halo and y-wrap
      neighbor copies are pre-shifted by whole box lengths, and the
      tile runs ``wrap=False``. The x-periodic image needs NO shift
      tensor because halo rows normalize against VIRTUAL centers that
      continue past the slab edge (the domain rebuild assigns them,
      parallel/domain.py) — the boundary shard's +-Lx folds into the
      coordinates. Exact for every in-cutoff pair by the standard
      argument: disagreement with per-pair min-image needs a pair
      distance >= cell width > r_cut.
    - x never wraps in the neighbor table (:func:`_xy_neighbor_table_slab`).

    ``clist.slot_of`` carries EXT-grid flat slots (what the domain
    rebuild produces); the force gather subtracts one x-layer of slots to
    address the own-grid kernel output, which also maps halo/dump slots
    out of range (masked to zero — halo forces belong to their owner).
    ``mean_occ`` feeds the static s1/cap1 splits; pass the resident mean
    (``position.shape[0]`` overcounts fillers).
    """
    n = position.shape[0]
    dtype = jnp.float32
    idx = clist.bucket_idx  # (C_ext, cap)
    C_ext, cap = idx.shape
    cx, cy, cz = cfg.ncells  # ext grid
    assert min(cx, cy, cz) >= 3, "slab cols kernel needs >=3 cells/axis"
    XYe = cx * cy
    XYo = (cx - 2) * cy
    C_own = XYo * cz
    r = pack.r_pad

    if mean_occ is None:
        mean_occ = n / max(C_own, 1)
    if jsplit is None:
        cap1 = int((mean_occ + 2.6 * np.sqrt(mean_occ)) // 8) * 8
    else:
        cap1 = int(jsplit)
    cap1 = max(0, min(cap1, cap))
    split = cap1 >= 8 and (cap - cap1) >= 8
    if s1 is None:
        s1 = int((mean_occ + np.sqrt(mean_occ)) // 8) * 8
    s1 = max(8, min(int(s1), cap))

    prewrapped = cell_ctr is not None
    box_f = jnp.asarray(box_L, dtype)
    far = jnp.full((1, 3), jnp.asarray(1e6, dtype))
    pos_f = position.astype(dtype)
    if prewrapped:
        from cavmd_tpu.core.box import minimum_image

        ctr = cell_ctr.astype(dtype)
        pos_f = ctr + minimum_image(pos_f - ctr, box_f)
    pos_pad = jnp.concatenate([pos_f, far])  # (n+1, 3)
    rows = jnp.concatenate([pos_pad, pack.static_rows], axis=1)

    pext = rows[idx].reshape(XYe, cz, cap, r)
    pi = pext.reshape(cx, cy, cz, cap, r)[1:-1].reshape(XYo, cz, cap, r)
    if prewrapped:
        # z-halo copies pre-shifted by whole box lengths (production
        # cols-kernel pattern)
        z_shift = jnp.zeros((1, 1, 1, r), dtype).at[0, 0, 0, 2].set(1.0)
        zh = jnp.concatenate([
            pext[:, -1:] - box_f[2] * z_shift,
            pext,
            pext[:, :1] + box_f[2] * z_shift,
        ], axis=1)
    else:
        # plain wrapped copies (per-pair min-image absorbs the +-Lz)
        zh = jnp.concatenate([pext[:, -1:], pext, pext[:, :1]], axis=1)
    xy_nb_np, ywrap_np = _xy_neighbor_table_slab(cx, cy)
    xy_nb = jnp.asarray(xy_nb_np, jnp.int32)
    xy_shift = None
    if prewrapped:
        row_y = jnp.zeros((r,), dtype).at[1].set(1.0)
        xy_shift = (
            (jnp.asarray(ywrap_np, dtype) * box_f[1])[:, :, None, None]
            * row_y[None, None, :, None]
        )  # (XYo, 9, r, 1)

    def halo_cols(zh_slice, cap_x):
        """(XYe, cz+2, cap_x, r) -> (XYo, 9, r, zcap_pad) neighbor cols."""
        zcap = (cz + 2) * cap_x
        zcap_pad = _round_up(zcap, 128)
        jsrc = jnp.transpose(zh_slice, (0, 3, 1, 2)).reshape(XYe, r, zcap)
        if zcap_pad != zcap:
            sent_col = (
                jnp.zeros((r,), dtype).at[:3].set(1e6).at[4].set(float(n))
            )
            pad = jnp.broadcast_to(
                sent_col[None, :, None], (XYe, r, zcap_pad - zcap)
            )
            jsrc = jnp.concatenate([jsrc, pad], axis=2)
        out = jsrc[xy_nb]
        if xy_shift is not None:
            out = out + xy_shift
        return out, zcap_pad

    box = jnp.asarray(box_L, dtype).reshape(3)
    scal = jnp.concatenate(
        [jnp.asarray(kappa, dtype).reshape(1), box,
         jnp.asarray(float(n), dtype).reshape(1)]
    ).reshape(1, 5)
    rc2 = float(cfg.r_cut) ** 2

    occ_ext = jnp.sum(idx < n, axis=1, dtype=jnp.int32).reshape(XYe, cz)
    occ_own = occ_ext.reshape(cx, cy, cz)[1:-1].reshape(XYo, cz)

    common_out = dict(
        out_specs=[
            pl.BlockSpec((1, cz, cap, 8), lambda c: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            vma_struct((XYo, cz, cap, 8), dtype, position),
            vma_struct((1, 1), dtype, position),
            vma_struct((1, 1), dtype, position),
        ],
        interpret=interpret,
    )

    if split:
        cap2 = cap - cap1
        lanes_padA = _round_up(27 * cap1, 128)
        lanes_padB = _round_up(27 * cap2, 128)
        pjA, zcapA_pad = halo_cols(zh[:, :, :cap1], cap1)
        pjB, zcapB_pad = halo_cols(zh[:, :, cap1:], cap2)
        occ_nb = jnp.max(occ_ext[xy_nb], axis=1)  # (XYo, cz)
        over = jnp.maximum(
            jnp.maximum(jnp.roll(occ_nb, 1, axis=1), occ_nb),
            jnp.roll(occ_nb, -1, axis=1),
        )  # periodic z window max
        flag = (over > cap1).astype(jnp.int32)

        kernel = functools.partial(
            _cell_cols_kernel_jsplit, pack=pack, rc2=rc2, cz=cz, cap=cap,
            cap1=cap1, lanes_padA=lanes_padA, lanes_padB=lanes_padB,
            s1=s1, wrap=not prewrapped,
        )
        out = pl.pallas_call(
            kernel,
            grid=(XYo,),
            in_specs=[
                pl.BlockSpec((1, cz, cap, r), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 9, r, zcapA_pad), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 9, r, zcapB_pad), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # (XYo, cz) occ
                pl.BlockSpec(memory_space=pltpu.SMEM),  # (XYo, cz) B flag
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[pltpu.VMEM((r, lanes_padA), jnp.float32),
                            pltpu.VMEM((r, lanes_padB), jnp.float32)],
            **common_out,
        )(pi, pjA, pjB, occ_own, flag, scal)
    else:
        lanes_pad = _round_up(27 * cap, 128)
        pj, zcap_pad = halo_cols(zh, cap)
        kernel = functools.partial(_cell_cols_kernel, pack=pack, rc2=rc2,
                                   cz=cz, cap=cap, lanes_pad=lanes_pad,
                                   s1=s1, wrap=not prewrapped)
        out = pl.pallas_call(
            kernel,
            grid=(XYo,),
            in_specs=[
                pl.BlockSpec((1, cz, cap, r), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 9, r, zcap_pad), lambda c: (c, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),  # (XYo, cz) occ
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[pltpu.VMEM((r, lanes_pad), jnp.float32)],
            **common_out,
        )(pi, pj, occ_own, scal)
    out, elj, eew = out

    from cavmd_tpu.ops.neighbor import slot_gather_forces

    # ext-grid slots -> own-grid slots: drop one x-layer of slots; halo
    # rows (dump slot) and anything below the first own layer map out of
    # range and gather zero
    H = cy * cz * cap
    ext_slot = clist.slot_of
    own_slot = jnp.where(ext_slot >= H, ext_slot - H, C_own * cap)
    forces = slot_gather_forces(
        out.reshape(C_own, cap, 8), clist._replace(slot_of=own_slot), n
    )
    e_lj = 0.5 * elj[0, 0]
    e_ew = 0.5 * eew[0, 0]
    return (forces.astype(position.dtype),
            e_lj.astype(position.dtype), e_ew.astype(position.dtype))


def _zcol_kernel(pi_ref, pj_ref, hull_ref, scal_ref, out_ref, acc_ref, *,
                 pack: "CellPallasPack", rc2, bi, W, pred):
    """One (column, i-block) per grid step over the z-sorted layout.

    ``pi_ref``: (1, bi, R) the i-block's rows. ``pj_ref``: (1, NB+1, R,
    128) the column's MERGED z-sorted candidate halo, block-major, with
    one all-sentinel PARKING block appended at index NB (far coordinates,
    id = n: every pair against it fails the validity mask). The halo is
    resident across the column's i-block steps (the index map pins it
    per column). ``hull_ref`` (SMEM): (1, NIB, 4) per-i-block TWO-RUN
    hull ``(s1, c1, s2, count)``: the z-sorted blocks whose live z-range can
    reach this i-block form at most two maximal runs in linear block
    order — one in the common case, two when the window wraps the
    periodic z seam (the halo's sentinel tail sits between the high-z
    and low-z blocks in index space, so a CIRCULAR single-arc hull there
    would sweep up to ~NB/2 dead blocks; measured max 21 of 36 blocks at
    N=100k vs 7 actually set). XLA computes per-block overlap bits from
    masked min/max bounds, splits at the largest internal zero gap, and
    parks empty runs at NB.

    The loop is a STATIC ``W``-visit unroll with plain register
    accumulators. Both dynamic-trip-count variants measured far worse
    (v5e, N=100k): a scan-all-blocks-with-bit-predicate loop burned
    ~14 ms/step of scalar-loop overhead (333k off-iterations), and a
    ``fori_loop`` over only the hull (36k iterations) still ran the
    kernel at ~3x the static unroll — dynamic trip counts defeat
    Mosaic's software pipelining, and VMEM-scratch accumulators add five
    (bi, 128) read-modify-writes per visit. Visit t reads run 1 while
    ``t < c1``, then run 2; visits past the runs walk past the last run
    into clear-bit blocks (zero contribution by the r_cut/validity mask)
    and clamp onto the parking block at NB. ``c1 + c2 > W`` would
    silently DROP blocks — the caller checks it into the overflow
    failure-detection channel instead (see ``fused_zsort_cols_pallas``).
    """
    nb = pj_ref.shape[1] - 1  # parking block index
    ib = pl.program_id(1)
    s1 = hull_ref[0, ib, 0]
    c1 = hull_ref[0, ib, 1]
    s2 = hull_ref[0, ib, 2]
    cnt = hull_ref[0, ib, 3]
    out_ref[0] = jnp.zeros((out_ref.shape[1], 8), jnp.float32)

    # ~1/3 of i-blocks are fully past their column's occupancy (the
    # sentinel tail of the sorted slot range) — c1 == 0 there, skip the
    # whole visit loop (the occupancy-predication idea from the bucket
    # kernel's two-tier split, applied at i-block granularity)
    @pl.when(c1 > 0)
    def _compute():
        pi = pi_ref[0]  # (bi, R)

        def visit(t, accs):
            jb = jnp.where(t < c1, s1 + t, s2 + (t - c1))
            jb = jnp.minimum(jb, nb)
            jblk = pj_ref[0, jb]  # (R, 128)

            def jrow(row, _j=jblk):  # (1, 128) — static block slice
                return _j[row:row + 1, :]

            parts = _fused_tile(
                pi, jrow, scal_ref, pack, rc2, wrap=True, reduce=False
            )
            if accs is None:
                return list(parts)
            return [a + p for a, p in zip(accs, parts)]

        if not pred:
            accs = None
            for t in range(W):
                accs = visit(t, accs)
            for col, acc in enumerate(accs):
                out_ref[0, :, col:col + 1] = jnp.sum(acc, axis=1,
                                                     keepdims=True)
            return

        # per-visit predication: the hull count varies ~3-7 around the
        # static W (which also carries drift margin) — skip visits past
        # this i-block's true count instead of parking them. Register
        # accumulators can't cross pl.when regions, so partials
        # accumulate in a (5, bi, 128) VMEM scratch (full-lane adds) and
        # reduce once per i-block.
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)
        for t in range(W):
            @pl.when(t < cnt)
            def _v(t=t):
                parts = visit(t, None)
                for col, p in enumerate(parts):
                    acc_ref[col] += p
        for col in range(5):
            out_ref[0, :, col:col + 1] = jnp.sum(acc_ref[col], axis=1,
                                                 keepdims=True)


def plan_zcol_window(n, n_columns, ncells_xy, bi=16):
    """Static visit-window width for :func:`fused_zsort_cols_pallas`.

    Mean column occupancy x the 2 r_cut z-fraction x 9 columns, plus the
    i-block's own z-span (~9 bi slots), with a +30% density margin.
    ``Lz >= min(cx, cy) * column_width >= min(cx, cy) * r_cut`` bounds
    the z-fraction without reading the (traced) box. +3 blocks: measured
    at N=66k the t=0 max hull hit est+2 exactly (local z-density
    fluctuations), so +2 left zero drift headroom and a 500-step run
    tripped the window-overflow flag. Shared by ``ForceField.create``
    (which stores the planned W so overflow recovery can grow it) and
    the kernel's ``W=None`` default.
    """
    est = 9 * bi + 1.3 * 18.0 * (n / n_columns) / min(ncells_xy)
    return int(np.ceil(est / 128.0)) + 3


def fused_zsort_cols_pallas(position, box_L, clist, cfg,
                            pack: CellPallasPack, kappa, interpret=False,
                            bi=16, W=None, pred=True):
    """Fused LJ + Ewald-short pass over the z-sorted column layout.

    Round-3 successor of :func:`fused_cell_cols_pallas` (the VERDICT r2
    "structural fix" item): instead of fixed-capacity z cells with a
    27-cell static candidate window (cap sized for the max-occupancy cell,
    so >50% of tile slots are padding), particles are z-SORTED inside
    r_cut-wide xy columns (``build_zcol_list``) and each 128-slot block of
    a column's MERGED 9-column halo is visited only when its live z-range
    can reach the i-block (two-run window hull, see :func:`_zcol_kernel`).
    Candidate lanes per i-row drop from 27*cap (~1.3k) to
    ~(bi + 2 r_cut density) * 9 rounded to 128-blocks (~5-6 blocks),
    independent of the occupancy tail that forced the bucket cap.

    Correctness under drift: coordinates are reconstructed ONCE per step
    as ``local_anchor + minimage(position - anchor)`` (continuous across
    box-wrap events between rebuilds), block z-bounds are recomputed from
    those live coordinates (masked min/max), and the overlap test runs on
    the periodic z circle — so the pruned window provably contains every
    pair within r_cut at the CURRENT positions, independent of how far
    particles drifted since the rebuild (xy coverage is the standard
    width >= r_cut + skin cell guarantee). Pair math is exact: full
    per-pair minimum-image (a pre-shifted-image variant saved ~9 VPU
    ops/slot but cost ~2 ms/step of XLA scatter-add + layout-copy prep
    on the halo — measured net loss).

    Reference anchor: the role of the reference's cell/neighbor GPU path
    (``src/CavityForceComputeGPU.cu`` per-particle kernels), done
    TPU-native: static shapes, sorted contiguous windows, VPU tiles.
    """
    n = position.shape[0]
    dtype = jnp.float32
    idx = clist.bucket_idx  # (XY, Kc)
    XY, Kc = idx.shape
    cx, cy, _ = cfg.ncells
    assert min(cx, cy) >= 3, "zcol kernel needs >=3 columns per axis"
    assert Kc % 128 == 0 and Kc % bi == 0 and bi % 8 == 0
    r = pack.r_pad
    NB = (9 * Kc) // 128
    NIB = Kc // bi

    box_f = jnp.asarray(box_L, dtype)
    # drift-continuous local coordinates: a particle that re-wrapped since
    # the rebuild keeps a coordinate adjacent to its sorted slot
    disp = position.astype(dtype) - clist.anchor.astype(dtype)
    disp = disp - box_f * jnp.round(disp / box_f)
    pos_loc = clist.local_anchor.astype(dtype) + disp

    far = jnp.full((1, 3), jnp.asarray(1e6, dtype))
    pos_pad = jnp.concatenate([pos_loc, far])  # (N+1, 3)
    rows = jnp.concatenate([pos_pad, pack.static_rows], axis=1)  # (N+1, R)

    pi = rows[idx]  # (XY, Kc, R)
    ph = rows[clist.halo_idx]  # (XY, 9Kc, R)
    pj = jnp.transpose(ph.reshape(XY, NB, 128, r), (0, 1, 3, 2))

    def block_bounds(z, real, blk):
        zb = z.reshape(XY, -1, blk)
        rb = real.reshape(XY, -1, blk)
        bmin = jnp.min(jnp.where(rb, zb, jnp.inf), axis=-1)
        bmax = jnp.max(jnp.where(rb, zb, -jnp.inf), axis=-1)
        return bmin, bmax, jnp.any(rb, axis=-1)

    imin, imax, iact = block_bounds(pi[:, :, 2], idx < n, bi)
    jmin, jmax, jact = block_bounds(ph[:, :, 2], clist.halo_idx < n, 128)

    # circular-interval overlap on the periodic z axis: arcs [imin-rc,
    # imax+rc] and [jmin, jmax] intersect iff the wrapped center distance
    # is within the half-length sum (exact while the sum < Lz/2; beyond
    # that the test degenerates to always-true, which is merely
    # conservative). NaNs from empty-block infinities compare false and
    # the activity masks clear them anyway.
    Lz = box_f[2]
    rc = float(cfg.r_cut)
    ic, ih = 0.5 * (imin + imax), 0.5 * (imax - imin)
    jc, jh = 0.5 * (jmin + jmax), 0.5 * (jmax - jmin)
    d = ic[:, :, None] - jc[:, None, :]
    d = jnp.abs(d - Lz * jnp.round(d / Lz))
    thresh = ih[:, :, None] + jh[:, None, :] + rc
    overlap = (
        ((d <= thresh) | (thresh >= 0.5 * Lz))
        & iact[:, :, None] & jact[:, None, :]
    )

    # collapse the per-block overlap bits to a TWO-RUN hull (s1, c1, s2):
    # the set bits form one linear run in the common case and two when
    # the i-window wraps the periodic z seam (the sorted halo's sentinel
    # tail lies between the high-z and low-z blocks, so a circular
    # single-arc hull would sweep it — measured 21 of 36 blocks on seam
    # rows vs 7 set). Split at the largest INTERNAL zero gap: run 1 =
    # [lo, prev(p)], run 2 = [p, hi] where p is the set bit after that
    # gap. Any extra internal holes stay inside a run and are computed
    # harmlessly (their pairs fail the r_cut mask). One running
    # last-set-index scan gives prev() without gathers.
    t_idx = jnp.arange(NB, dtype=jnp.int32)
    any_set = jnp.any(overlap, axis=-1)
    lo = jnp.argmax(overlap, axis=-1).astype(jnp.int32)
    hi = (NB - 1 - jnp.argmax(overlap[:, :, ::-1], axis=-1)).astype(
        jnp.int32
    )
    incl = jax.lax.associative_scan(
        jnp.maximum, jnp.where(overlap, t_idx, jnp.int32(-1)), axis=-1
    )
    prev = jnp.concatenate(
        [jnp.full(incl.shape[:-1] + (1,), -1, jnp.int32),
         incl[:, :, :-1]], axis=-1,
    )  # last set index strictly before t
    gap = jnp.where(
        overlap & (prev >= 0), t_idx - prev - 1, jnp.int32(-1)
    )  # zero-gap length just before each set bit
    g = jnp.max(gap, axis=-1)
    p = jnp.argmax(gap, axis=-1).astype(jnp.int32)
    split = g > 0
    e1 = jnp.where(split, p - g - 1, hi)  # prev(p) == p - g - 1
    s1 = jnp.where(any_set, lo, NB)
    c1 = jnp.where(any_set, e1 - lo + 1, 0)
    s2 = jnp.where(split & any_set, p, NB)
    c2 = jnp.where(split & any_set, hi - p + 1, 0)
    count = c1 + c2
    hull = jnp.stack([s1, c1, s2, count], axis=-1)  # (XY, NIB, 4)

    # static window width for the kernel's unrolled visit loop: mean
    # column occupancy x the 2 r_cut z-fraction x 9 columns, plus the
    # i-block's own z-span (~9 bi slots), with a +30% density margin,
    # one spare block, and one more for the two-run edge rounding. Lz >=
    # min(cx, cy) * column_width >= min(cx, cy) * r_cut bounds the
    # z-fraction without reading the (traced) box. A hull wider than W
    # would silently drop blocks, so it is flagged into the overflow
    # channel below (triggering the driver's failure-detection path)
    # instead.
    if W is None:
        W = plan_zcol_window(n, XY, (cx, cy), bi=bi)
    W = max(1, min(int(W), NB))
    win_overflow = jnp.max(count) > W

    box = jnp.asarray(box_L, dtype).reshape(3)
    scal = jnp.concatenate(
        [jnp.asarray(kappa, dtype).reshape(1), box,
         jnp.asarray(float(n), dtype).reshape(1)]
    ).reshape(1, 5)
    rc2 = rc * rc

    # parking block at index NB: all-sentinel rows (see _zcol_kernel)
    park = jnp.broadcast_to(
        rows[n].reshape(1, 1, r, 1), (XY, 1, r, 128)
    ).astype(dtype)
    pj2 = jnp.concatenate([pj, park], axis=1)  # (XY, NB+1, R, 128)

    kernel = functools.partial(_zcol_kernel, pack=pack, rc2=rc2, bi=bi,
                               W=W, pred=pred)
    out = pl.pallas_call(
        kernel,
        grid=(XY, NIB),
        in_specs=[
            pl.BlockSpec((1, bi, r), lambda c, ib: (c, ib, 0),
                         memory_space=pltpu.VMEM),
            # pinned per column: fetched once, reused by all NIB steps
            pl.BlockSpec((1, NB + 1, r, 128), lambda c, ib: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # SMEM blocks must span the trailing array dims exactly: one
            # (NIB, 4) hull table per column, i-block-indexed in-kernel
            pl.BlockSpec((1, NIB, 4), lambda c, ib: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, bi, 8), lambda c, ib: (c, ib, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((XY, Kc, 8), dtype),
        scratch_shapes=[pltpu.VMEM((5, bi, 128), jnp.float32)],
        interpret=interpret,
    )(pi, pj2, hull, scal)

    from cavmd_tpu.ops.neighbor import slot_gather_forces

    forces = slot_gather_forces(out, clist, n)
    e_lj = 0.5 * jnp.sum(out[:, :, 3])
    e_ew = 0.5 * jnp.sum(out[:, :, 4])
    return (forces.astype(position.dtype),
            e_lj.astype(position.dtype), e_ew.astype(position.dtype),
            win_overflow)


def fused_cell_pallas(position, box_L, clist, cfg, pack: CellPallasPack,
                      kappa, interpret=False):
    """Fused LJ + Ewald-short pass over cell tiles via the Pallas kernel.

    Returns (forces (N,3), e_lj, e_ew). Requires a uniform cutoff
    (cfg.r_cut applies to every enabled pair) and f32 data. The i/j tiles
    are pre-gathered in XLA (memory-bound, fine there); the kernel runs the
    flop-dense tile pipeline with all intermediates in VMEM.
    """
    n = position.shape[0]
    dtype = jnp.float32
    idx = clist.bucket_idx  # (C, cap)
    C, cap = idx.shape
    r = pack.r_pad
    lanes = _round_up(27 * cap, 128)

    far = jnp.full((1, 3), jnp.asarray(1e6, dtype))
    pos_pad = jnp.concatenate([position.astype(dtype), far])  # (N+1, 3)
    rows = jnp.concatenate([pos_pad, pack.static_rows], axis=1)  # (N+1, R)

    pi = rows[idx]  # (C, cap, R) — the i-side tiles
    # j-side: (C, R, 27cap) from whole-bucket gathers; sentinel cell C is
    # an always-empty phantom (deduped neighbor slots point at it)
    sentinel = jnp.zeros((1, cap, r), dtype).at[:, :, :3].set(1e6)
    sentinel = sentinel.at[:, :, 4].set(float(n))
    pc = jnp.concatenate([pi, sentinel])  # (C+1, cap, R)
    pj = pc[clist.neighbor_cells]  # (C, 27, cap, R)
    pj = jnp.moveaxis(pj, 3, 1).reshape(C, r, 27 * cap)
    # lane padding carries sentinel values (far position, id = n): zero
    # padding would alias particle id 0 / the origin and can produce an
    # exact-zero wrapped distance (0/0 -> NaN in the energy sums)
    sent_col = (
        jnp.zeros((r,), dtype).at[:3].set(1e6).at[4].set(float(n))
    )
    pad_block = jnp.broadcast_to(
        sent_col[None, :, None], (C, r, lanes - 27 * cap)
    )
    pj = jnp.concatenate([pj, pad_block], axis=2)

    # G cells per grid step (single-cell steps are grid-overhead-bound);
    # pad the cell axis with inert sentinel cells when G doesn't divide C
    G = min(16, C)
    C_pad = _round_up(C, G)
    if C_pad != C:
        pi = jnp.concatenate(
            [pi, jnp.broadcast_to(sentinel, (C_pad - C, cap, r))]
        )
        pj = jnp.concatenate(
            [pj, jnp.broadcast_to(sent_col[None, :, None],
                                  (C_pad - C, r, lanes))]
        )

    box = jnp.asarray(box_L, dtype).reshape(3)
    scal = jnp.concatenate(
        [jnp.asarray(kappa, dtype).reshape(1), box,
         jnp.asarray(float(n), dtype).reshape(1)]
    ).reshape(1, 5)
    rc2 = float(cfg.r_cut) ** 2

    kernel = functools.partial(_cell_kernel, pack=pack, rc2=rc2,
                               cells_per_step=G)
    out = pl.pallas_call(
        kernel,
        grid_spec=pl.GridSpec(
            grid=(C_pad // G,),
            in_specs=[
                pl.BlockSpec((G, cap, r), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, r, lanes), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((G, cap, 8), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=vma_struct((C_pad, cap, 8), dtype, position),
        interpret=interpret,
    )(pi, pj, scal)

    from cavmd_tpu.ops.neighbor import slot_gather_forces

    forces = slot_gather_forces(out[:C], clist, n)
    e_lj = 0.5 * jnp.sum(out[:, :, 3])
    e_ew = 0.5 * jnp.sum(out[:, :, 4])
    return (forces.astype(position.dtype),
            e_lj.astype(position.dtype), e_ew.astype(position.dtype))
