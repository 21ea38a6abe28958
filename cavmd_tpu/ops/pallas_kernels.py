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
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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

        return PallasPairPack(
            eps=pad2(pair.eps),
            sig2=pad2(pair.sig2, 1.0),
            rcut2=pad2(pair.rcut2),
            vshift=pad2(pair.vshift),
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


def _erfc_pos(x):
    """erfc(x) for x >= 0 — Abramowitz & Stegun 7.1.26 rational approx
    (abs error < 1.5e-7; Mosaic has no erfc primitive)."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741
                                   + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * jnp.exp(-x * x)


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
