"""Pallas TPU kernel for the PPPM charge-spreading stage.

The XLA spread path (ops/pppm.py:_spread_matrices + one GEMM) is
MXU-friendly but materializes the Khatri-Rao factor ``B = Sy (x) Sz`` of
shape (N, Ky*Kz) to HBM — 410 MB/step at N=100k, ~2.5 ms of pure
bandwidth (measured v5e, xprof). This kernel keeps the whole pipeline in
VMEM: per chunk of particles it evaluates the B-spline stencils directly
on (chunk, K) lanes, expands them to the (chunk, Ky*Kz) Khatri-Rao
layout with exact one-hot MXU dots (``_expand_tables``), and accumulates
the (Kx, Ky*Kz) grid with one contraction per chunk. HBM traffic drops
to reading positions/charges once and writing the 128 KB grid.

The backward pass (forces) is the analytic vjp — the same chunk pipeline
run against the grid cotangent — wired through ``jax.custom_vjp`` so
``jax.grad`` of the mesh energy works unchanged.

B-spline evaluation in-kernel: S[n, x] = M_p(frac_n + t) where
``t = (base_n - x) mod K`` (zero outside 0 <= t < p). The Cox-de Boor
recursion is evaluated SHIFT-INDEXED on full (chunk, K) lanes: level-1 is
the indicator of [0,1) at shifts s = 0..p-1 and
``M_n[s] = ((a-s) M_{n-1}[s] + (n-(a-s)) M_{n-1}[s+1]) / (n-1)`` — full
VPU lane utilization, and the penultimate level gives the analytic
derivative ``M_p' = M_{p-1}[0] - M_{p-1}[1]`` for free (backward pass).

Parity anchor: this is the TPU answer to the reference GPU's
shared-memory spreading pivot (CavityForceComputeGPU.cu:323-377); the
physics matches hoomd.md.long_range.pppm's cloud-in-cell assignment at
order p (ref examples/05_advanced_run.py:598-604).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cavmd_tpu.ops.pallas_kernels import vma_struct

import os

# Tri-state switch, bound ONCE at import: callers cache the force function
# (lru_cache + jit), so a late env-var flip could never take effect anyway.
# Binding here makes that explicit instead of trace-time-dependent.
# None (unset) = auto heuristic; "1" = force on; "0" = force off.
_PALLAS_SPREAD_MODE = os.environ.get("CAVMD_PPPM_PALLAS")
_PALLAS_SPREAD_ENABLED = _PALLAS_SPREAD_MODE == "1"

# Mosaic dots support only DEFAULT (single-pass bf16) and HIGHEST (bf16x6)
# — HIGH (bf16x3) raises NotImplementedError, yet HIGH is exactly what the
# XLA spread path uses (ops/pppm.py:_PPPM_PRECISION, accuracy-validated:
# 1.5e-5 rel force error vs f64). _split_bf16 + _dot3 reconstruct HIGH
# manually: each operand stored as its bf16 upper half plus a bf16
# residual, contracted as the three significant cross terms with DEFAULT
# dots — identical error structure to XLA's bf16x3 algorithm at half the
# HIGHEST pass count, and half the buffer bytes of f32 operands.


def _coxdeboor(arg, order):
    """Shift-indexed Cox-de Boor recursion on full lane arrays.

    ``arg`` (chunk, L) -> S = M_order(arg) and dS = M'_order(arg) =
    M_{order-1}[0] - M_{order-1}[1], both (chunk, L). Elementwise in
    lanes, so it runs identically on one axis's (chunk, K) window or on
    the three axes stacked to (chunk, Kx+Ky+Kz)."""
    level = [
        jnp.where((arg - s >= 0.0) & (arg - s < 1.0),
                  jnp.ones_like(arg), jnp.zeros_like(arg))
        for s in range(order)
    ]
    penultimate = None
    for n in range(2, order + 1):
        new = []
        for s in range(order - n + 1):
            a = arg - s
            nxt = level[s + 1] if s + 1 < len(level) else jnp.zeros_like(arg)
            new.append((a * level[s] + (n - a) * nxt) / (n - 1))
        if n == order:
            penultimate = level
        level = new
    S = level[0]
    dS = penultimate[0] - (penultimate[1] if len(penultimate) > 1
                           else jnp.zeros_like(arg))
    return S, dS


def _stencils(pos_d, K, inv_L, order):
    """(chunk,) positions along one axis -> S (chunk, K) B-spline weights
    and dS (chunk, K) their derivative w.r.t. the grid coordinate u."""
    dtype = pos_d.dtype
    u = (pos_d * inv_L + 0.5) * K  # grid coords in [0, K)
    base = jnp.floor(u)
    frac = (u - base)[:, None]  # (chunk, 1)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1).astype(jnp.float32)
    t = base[:, None] - lanes
    t = t - K * jnp.floor(t * (1.0 / K))  # mod K, reciprocal-multiply
    arg = frac + t  # (chunk, K)

    S, dS = _coxdeboor(arg, order)
    return S.astype(dtype), dS.astype(dtype)


def _stencils_stacked(pos, scal2, cst, order):
    """All three axes' stencils in ONE recursion on (chunk, Kx+Ky+Kz).

    At K=32 the per-axis recursion runs (chunk, 32) arrays — 32/128 VPU
    lanes per op. Stacking the axes along lanes fills 96/128 and shares
    the ~21-op Cox-de Boor pipeline three ways; the lane constants
    (segment masks / in-segment lane index / per-lane K) come in via
    ``cst`` (see :func:`_stacked_consts`) and the axis slicing downstream
    is absorbed by the zero-row-padded expansion tables
    (:func:`_expand_tables_stacked`) at no extra MXU passes while
    Kx+Ky+Kz <= 128.

    ``pos`` (chunk, 3); ``scal2`` (2, 3) rows [K/L, K/2] per axis (so
    u_d = pos_d * K_d/L_d + K_d/2 — exact f32 VPU madds, never an MXU
    dot, whose bf16 passes would corrupt floor(u)).
    """
    mask = [cst[d:d + 1, :] for d in range(3)]  # (1, Ktot) 0/1 per axis
    seg_lane = cst[3:4, :]
    Kvec = cst[4:5, :]
    invK = cst[5:6, :]

    # u_d broadcast across its own segment, zero elsewhere
    U = (pos[:, 0:1] * scal2[0, 0] + scal2[1, 0]) * mask[0]
    U += (pos[:, 1:2] * scal2[0, 1] + scal2[1, 1]) * mask[1]
    U += (pos[:, 2:3] * scal2[0, 2] + scal2[1, 2]) * mask[2]
    base = jnp.floor(U)
    frac = U - base
    t = base - seg_lane
    t = t - Kvec * jnp.floor(t * invK)  # mod K_d, per-lane reciprocal
    arg = frac + t  # (chunk, Ktot)

    return _coxdeboor(arg, order)


def _stacked_consts(mesh):
    """(6, Kx+Ky+Kz) f32 lane constants for the stacked recursion:
    rows 0-2 = per-axis segment masks, 3 = lane index within its segment,
    4 = K of the lane's axis, 5 = 1/K."""
    Ks = list(mesh)
    ktot = sum(Ks)
    seg = np.repeat(np.arange(3), Ks)
    out = np.zeros((6, ktot), np.float32)
    for d in range(3):
        out[d] = seg == d
    out[3] = np.concatenate([np.arange(k) for k in Ks])
    out[4] = np.repeat(Ks, Ks)
    out[5] = 1.0 / out[4]
    return jnp.asarray(out)


def _split_bf16(x):
    """bf16 (hi, lo) split of an f32 array — the operands of a manual
    bf16x3 (~Precision.HIGH) dot. Storing both halves AS bf16 halves the
    buffer bytes vs f32 and avoids re-splitting inside each dot (the f32
    split path tripled VMEM residency: measured scoped-vmem OOM at 64^3)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a_hi, a_lo, b_hi, b_lo, dims):
    """The three significant cross terms of (a_hi+a_lo)@(b_hi+b_lo) as
    native-bf16 DEFAULT MXU passes — XLA's HIGH (bf16x3) algorithm."""

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dims, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))


def _dot2(x_f32, e_bf16, dims):
    """bf16x2 contraction of an f32 array against an EXACT bf16 operand
    (the 0/1 expansion tables below): x ~ hi + lo to ~2^-17 relative, and
    each product against a 0/1 entry is exact, so two DEFAULT passes give
    the same error class as the kernel's bf16x3 dots (whose operands are
    themselves only hi+lo-split to ~2^-17)."""
    hi, lo = _split_bf16(x_f32)

    def d(x):
        return jax.lax.dot_general(
            x, e_bf16, dims, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    return d(hi) + d(lo)


def _expand_tables(mesh):
    """Static one-hot expansion tables for the Khatri-Rao assembly.

    ``Ey (Ky, Ky*Kz)`` with ``Ey[y, m] = [m // Kz == y]`` and
    ``Ez (Kz, Ky*Kz)`` with ``Ez[z, m] = [m %% Kz == z]``: one MXU dot
    against them turns a (chunk, K) stencil into its (chunk, Ky*Kz)
    broadcast layout — replacing the per-y loop of Kz-wide strided scratch
    writes that dominated the kernel at K=32 (sub-128-lane masked
    read-modify-writes on the (chunk, Ky*Kz) tile; measured — see
    docs/performance.md). 0/1 entries are exact in bf16.
    """
    Ky, Kz = mesh[1], mesh[2]
    m = np.arange(Ky * Kz)
    ey = (m // Kz == np.arange(Ky)[:, None]).astype(np.float32)
    ez = (m % Kz == np.arange(Kz)[:, None]).astype(np.float32)
    return jnp.asarray(ey, jnp.bfloat16), jnp.asarray(ez, jnp.bfloat16)


def _is_pow2(k):
    return k >= 1 and (k & (k - 1)) == 0


def _tile_lanes(seg, reps):
    """Tile a (chunk, W) lane block ``reps`` (pow2) times by log2 concat
    doubling -> (chunk, W*reps).

    The z-factor of the Khatri-Rao layout is pure lane TILING
    (``SzE[n, y*Kz+z] = Sz[n, z]`` — the minor factor repeats verbatim),
    so it needs no one-hot MXU dot at all: log2(reps) lane concats build
    it as EXACT f32 copies. Measured v5e (N=100k, 32^3, chunk 512): this
    removes 2 of 7 MXU passes from the fwd spread and 4 of 14 from the
    bwd (together with :func:`_tile_sum`), and it is exact where the
    `_dot2` expansion was bf16x2-approximate. The y-factor
    (``m // Kz`` — element-repeat) has no such copy structure and keeps
    the one-hot dot."""
    out = seg
    r = reps
    while r > 1:
        out = jnp.concatenate([out, out], axis=1)
        r //= 2
    return out


def _tile_sum(x, reps):
    """Sum ``reps`` (pow2) consecutive lane tiles -> (chunk, W/reps):
    the exact adjoint of :func:`_tile_lanes` (pairwise halving adds, so
    the z-stencil cotangent ``gSz[n,z] = sum_y X[n, y*Kz+z]`` costs
    log2(reps) VPU adds instead of 2 MXU passes)."""
    w = x.shape[1]
    r = reps
    while r > 1:
        w //= 2
        x = x[:, :w] + x[:, w:]
        r //= 2
    return x


def _expand_tables_stacked(mesh):
    """One-hot expansion tables addressed by STACKED lane index.

    Same Ey/Ez as :func:`_expand_tables`, but with zero row blocks for
    the other axes' lane segments, shape (Kx+Ky+Kz, Ky*Kz): a dot of the
    stacked stencil array against them both selects the axis AND expands
    to the Khatri-Rao layout. While Kx+Ky+Kz <= 128 the contraction dim
    stays inside one MXU block, so the axis selection is free."""
    Kx, Ky, Kz = mesh
    m = np.arange(Ky * Kz)
    ktot = Kx + Ky + Kz
    ey = np.zeros((ktot, Ky * Kz), np.float32)
    ez = np.zeros((ktot, Ky * Kz), np.float32)
    ey[Kx:Kx + Ky] = m // Kz == np.arange(Ky)[:, None]
    ez[Kx + Ky:] = m % Kz == np.arange(Kz)[:, None]
    return jnp.asarray(ey, jnp.bfloat16), jnp.asarray(ez, jnp.bfloat16)


def _spread_fwd_kernel(pos_ref, q_ref, scal_ref, ey_ref, ez_ref, out_ref, *,
                       order, mesh, chunk):
    Kx, Ky, Kz = mesh
    i = pl.program_id(0)

    Sx, _ = _stencils(pos_ref[:, 0], Kx, scal_ref[0, 0], order)
    Sy, _ = _stencils(pos_ref[:, 1], Ky, scal_ref[0, 1], order)
    Sz, _ = _stencils(pos_ref[:, 2], Kz, scal_ref[0, 2], order)
    A = q_ref[:, 0:1] * Sx  # (chunk, Kx)

    # Khatri-Rao factor B[n, y*Kz+z] = Sy[n,y] * Sz[n,z]: expand both
    # stencils to full (chunk, Ky*Kz) lanes with one exact one-hot dot
    # each, then one full-lane multiply — a pure register/MXU pipeline
    # (the previous per-y strided-scratch assembly was the kernel's
    # dominant cost at K=32: Ky sub-128-lane masked RMW writes per chunk)
    dims = (((1,), (0,)), ((), ()))
    SzE = _tile_lanes(Sz, Ky) if _is_pow2(Ky) else _dot2(Sz, ez_ref[...],
                                                         dims)
    B = _dot2(Sy, ey_ref[...], dims) * SzE
    bh, bl = _split_bf16(B)

    a_hi, a_lo = _split_bf16(A)
    contrib = _dot3(
        a_hi, a_lo, bh, bl, (((0,), (0,)), ((), ()))
    )  # (Kx, Ky*Kz)

    @pl.when(i == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(i != 0)
    def _():
        out_ref[...] += contrib


def _spread_bwd_kernel(pos_ref, q_ref, scal_ref, ct_ref, ey_ref, ez_ref,
                       dpos_ref, *, order, mesh, chunk):
    Kx, Ky, Kz = mesh

    Sx, dSx = _stencils(pos_ref[:, 0], Kx, scal_ref[0, 0], order)
    Sy, dSy = _stencils(pos_ref[:, 1], Ky, scal_ref[0, 1], order)
    Sz, dSz = _stencils(pos_ref[:, 2], Kz, scal_ref[0, 2], order)
    q = q_ref[:, 0:1]
    A = q * Sx

    dims = (((1,), (0,)), ((), ()))
    SyE = _dot2(Sy, ey_ref[...], dims)  # (chunk, Ky*Kz) broadcast layouts
    SzE = _tile_lanes(Sz, Ky) if _is_pow2(Ky) else _dot2(Sz, ez_ref[...],
                                                         dims)
    bh, bl = _split_bf16(SyE * SzE)

    ct_hi, ct_lo = _split_bf16(ct_ref[...])  # (Kx, Ky*Kz) grid cotangent
    # dA[n,x] = sum_m B[n,m] ct[x,m];  dB[n,m] = sum_x A[n,x] ct[x,m]
    dA = _dot3(
        bh, bl, ct_hi, ct_lo, (((1,), (1,)), ((), ()))
    )  # (chunk, Kx)
    a_hi, a_lo = _split_bf16(A)
    dB = _dot3(
        a_hi, a_lo, ct_hi, ct_lo, (((1,), (0,)), ((), ()))
    )  # (chunk, Ky*Kz)

    # gSy[n,y] = sum_z dB[n,y*Kz+z] Sz[n,z] = (dB . SzE) @ Ey^T and
    # gSz[n,z] = sum_y dB[n,y*Kz+z] Sy[n,y] = (dB . SyE) @ Ez^T — the
    # contraction against the exact one-hot tables collapses the
    # broadcast axis on the MXU (full lanes, no per-y slicing)
    dims_t = (((1,), (1,)), ((), ()))
    gSy = _dot2(dB * SzE, ey_ref[...], dims_t)  # (chunk, Ky)
    gSz = (_tile_sum(dB * SyE, Ky) if _is_pow2(Ky)
           else _dot2(dB * SyE, ez_ref[...], dims_t))  # (chunk, Kz)
    gSx = q * dA

    # chain through u = (pos/L + 0.5) K: dpos_d = (K_d/L_d) sum_x gS dS
    dpos_ref[:, 0:1] = scal_ref[0, 0] * Kx * jnp.sum(
        gSx * dSx, axis=1, keepdims=True)
    dpos_ref[:, 1:2] = scal_ref[0, 1] * Ky * jnp.sum(
        gSy * dSy, axis=1, keepdims=True)
    dpos_ref[:, 2:3] = scal_ref[0, 2] * Kz * jnp.sum(
        gSz * dSz, axis=1, keepdims=True)


def _spread_fwd_kernel_stacked(pos_ref, q_ref, scal_ref, cst_ref, ey_ref,
                               ez_ref, out_ref, *, order, mesh, chunk):
    Kx, Ky, Kz = mesh
    i = pl.program_id(0)

    S, _ = _stencils_stacked(pos_ref[...], scal_ref[...], cst_ref[...],
                             order)  # (chunk, Kx+Ky+Kz)
    A = q_ref[:, 0:1] * S[:, :Kx]

    # the zero-row-padded table selects the y segment AND expands to the
    # (chunk, Ky*Kz) Khatri-Rao layout in the same MXU dot; the z factor
    # is pure lane tiling (exact copies, no dot — see _tile_lanes)
    dims = (((1,), (0,)), ((), ()))
    SyE = _dot2(S, ey_ref[...], dims)
    if _is_pow2(Ky):
        SzE = _tile_lanes(S[:, Kx + Ky:Kx + Ky + Kz], Ky)
    else:
        SzE = _dot2(S, ez_ref[...], dims)
    B = SyE * SzE
    bh, bl = _split_bf16(B)

    a_hi, a_lo = _split_bf16(A)
    contrib = _dot3(
        a_hi, a_lo, bh, bl, (((0,), (0,)), ((), ()))
    )  # (Kx, Ky*Kz)

    @pl.when(i == 0)
    def _():
        out_ref[...] = contrib

    @pl.when(i != 0)
    def _():
        out_ref[...] += contrib


def _spread_bwd_kernel_stacked(pos_ref, q_ref, scal_ref, cst_ref, ct_ref,
                               ey_ref, ez_ref, dpos_ref, *, order, mesh,
                               chunk):
    Kx, Ky, Kz = mesh

    S, dS = _stencils_stacked(pos_ref[...], scal_ref[...], cst_ref[...],
                              order)
    q = q_ref[:, 0:1]
    A = q * S[:, :Kx]

    dims = (((1,), (0,)), ((), ()))
    SyE = _dot2(S, ey_ref[...], dims)  # (chunk, Ky*Kz) broadcast layouts
    if _is_pow2(Ky):
        SzE = _tile_lanes(S[:, Kx + Ky:Kx + Ky + Kz], Ky)
    else:
        SzE = _dot2(S, ez_ref[...], dims)
    bh, bl = _split_bf16(SyE * SzE)

    ct_hi, ct_lo = _split_bf16(ct_ref[...])  # (Kx, Ky*Kz) grid cotangent
    dA = _dot3(
        bh, bl, ct_hi, ct_lo, (((1,), (1,)), ((), ()))
    )  # (chunk, Kx)
    a_hi, a_lo = _split_bf16(A)
    dB = _dot3(
        a_hi, a_lo, ct_hi, ct_lo, (((1,), (0,)), ((), ()))
    )  # (chunk, Ky*Kz)

    # transposed one-hot dot lands the y stencil gradient back in its
    # stacked lane segment (zero rows elsewhere); the z gradient is the
    # tile-sum adjoint of the lane tiling (log2(Ky) VPU adds, no dot)
    dims_t = (((1,), (1,)), ((), ()))
    gSy = _dot2(dB * SzE, ey_ref[...], dims_t)  # (chunk, Ktot), y-segment
    gSx = q * dA  # (chunk, Kx)

    # chain through u_d = pos_d * (K_d/L_d) + K_d/2: dpos_d = scal2[0,d]
    # * sum gS dS (gSy is zero outside its segment, so the full-lane sum
    # reduces exactly its own axis)
    dpos_ref[:, 0:1] = scal_ref[0, 0] * jnp.sum(
        gSx * dS[:, :Kx], axis=1, keepdims=True)
    dpos_ref[:, 1:2] = scal_ref[0, 1] * jnp.sum(
        gSy * dS, axis=1, keepdims=True)
    if _is_pow2(Ky):
        gSz = _tile_sum(dB * SyE, Ky)  # (chunk, Kz) compact
        dsz = dS[:, Kx + Ky:Kx + Ky + Kz]
        dpos_ref[:, 2:3] = scal_ref[0, 2] * jnp.sum(
            gSz * dsz, axis=1, keepdims=True)
    else:
        gSz = _dot2(dB * SyE, ez_ref[...], dims_t)  # (chunk, Ktot)
        dpos_ref[:, 2:3] = scal_ref[0, 2] * jnp.sum(
            gSz * dS, axis=1, keepdims=True)


def _pad_chunk(x, chunk, fill=0.0):
    n = x.shape[0]
    pad = (-n) % chunk
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
    )


def _resolve_stacked(mesh, stacked):
    """``stacked=None`` -> AUTO: the lane-stacked stencil schedule wins
    while the concatenated window Kx+Ky+Kz fits one 128-lane register
    (measured v5e, N=100k force+energy evals: 32^3 stacked 4.67 ms vs
    per-axis 5.26 vs XLA GEMM 4.92; 64^3 stacked 20.2 vs per-axis 14.5 —
    at 192 stacked lanes every recursion op splits into two registers
    and the zero-row-padded expansion tables stop being free)."""
    if stacked is None:
        return sum(mesh) <= 128
    return bool(stacked)


def _resolve_chunk(mesh, chunk):
    """Particle-chunk size bounded by VMEM: the bwd kernel materializes
    the (chunk, Ky*Kz) expansion layouts SyE/SzE, the bf16 B hi/lo
    values, and the f32 dB against the 16 MB scoped-vmem limit (the
    one-hot tables add 2 * K * Ky*Kz bf16, 512 KB each at 64^3)."""
    if chunk is not None:
        return chunk
    kyz = mesh[1] * mesh[2]
    if kyz <= 1024:
        return 512  # 32^3: ~10 MB scoped vmem; 512 beat 256 at every
        # probed N (2.00 vs 2.12 ms/eval at 25k, 2.85 vs 2.92 at 50k,
        # 4.67 ms at 100k — scripts/bench_spread_ab.py)
    if kyz <= 2048:
        return 256
    if kyz <= 4096:
        return 128  # 64^3: bwd holds bf16 B hi/lo + f32 dB + ct splits;
        # chunk 256 measured 21.5 MB scoped vmem (OOM at the 16 MB limit)
    return 64


def _scal_inputs(box_L, mesh, stacked):
    """Per-axis scale rows the kernels consume. Unstacked: (1, 3)
    1/L (the kernel applies K itself). Stacked: (2, 3) [K/L, K/2] so
    u_d = pos_d*scal[0,d] + scal[1,d] with no inline K constants."""
    inv = 1.0 / jnp.asarray(box_L, jnp.float32)
    if not stacked:
        return inv.reshape(1, 3)
    K = jnp.asarray(mesh, jnp.float32)
    return jnp.stack([inv * K, 0.5 * K])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def spread_grid_pallas(position, charge, box_L, order, mesh, chunk=None,
                       interpret=False, stacked=None):
    """Charge grid (Kx, Ky*Kz) via the Pallas spread kernel.

    Differentiable in ``position`` (analytic vjp). ``charge``/``box_L``
    receive zero cotangents (never differentiated in this framework).
    ``chunk=None`` auto-sizes against the VMEM budget (see
    :func:`_resolve_chunk`). ``stacked`` runs the three axis stencil
    recursions as ONE on concatenated lanes (see
    :func:`_stencils_stacked`) — identical results, different schedule;
    ``None`` picks by the measured lane-window crossover
    (:func:`_resolve_stacked`).
    """
    return _spread_call(position, charge, box_L, order, mesh, chunk,
                        interpret, stacked)


def _spread_call(position, charge, box_L, order, mesh, chunk, interpret,
                 stacked=None):
    stacked = _resolve_stacked(mesh, stacked)
    chunk = _resolve_chunk(mesh, chunk)
    Kx, Ky, Kz = mesh
    n = position.shape[0]
    pos = _pad_chunk(position.astype(jnp.float32), chunk)
    q = _pad_chunk(charge.astype(jnp.float32), chunk)[:, None]
    n_pad = pos.shape[0]
    scal = _scal_inputs(box_L, mesh, stacked)

    if stacked:
        ey, ez = _expand_tables_stacked(mesh)
        kernel = functools.partial(_spread_fwd_kernel_stacked, order=order,
                                   mesh=mesh, chunk=chunk)
        extra = [_stacked_consts(mesh)]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    else:
        ey, ez = _expand_tables(mesh)
        kernel = functools.partial(_spread_fwd_kernel, order=order,
                                   mesh=mesh, chunk=chunk)
        extra, extra_specs = [], []
    return pl.pallas_call(
        kernel,
        grid=(n_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale rows
            *extra_specs,                           # stacked lane consts
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Ey
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Ez
        ],
        out_specs=pl.BlockSpec((Kx, Ky * Kz), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=vma_struct((Kx, Ky * Kz), jnp.float32, pos),
        interpret=interpret,
    )(pos, q, scal, *extra, ey, ez)


def _spread_fwd(position, charge, box_L, order, mesh, chunk, interpret,
                stacked):
    grid = _spread_call(position, charge, box_L, order, mesh, chunk,
                        interpret, stacked)
    return grid, (position, charge, box_L)


def _spread_bwd(order, mesh, chunk, interpret, stacked, res, ct):
    position, charge, box_L = res
    stacked = _resolve_stacked(mesh, stacked)
    chunk = _resolve_chunk(mesh, chunk)
    Kx, Ky, Kz = mesh
    n = position.shape[0]
    pos = _pad_chunk(position.astype(jnp.float32), chunk)
    q = _pad_chunk(charge.astype(jnp.float32), chunk)[:, None]
    n_pad = pos.shape[0]
    scal = _scal_inputs(box_L, mesh, stacked)

    if stacked:
        ey, ez = _expand_tables_stacked(mesh)
        kernel = functools.partial(_spread_bwd_kernel_stacked, order=order,
                                   mesh=mesh, chunk=chunk)
        extra = [_stacked_consts(mesh)]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    else:
        ey, ez = _expand_tables(mesh)
        kernel = functools.partial(_spread_bwd_kernel, order=order,
                                   mesh=mesh, chunk=chunk)
        extra, extra_specs = [], []
    dpos = pl.pallas_call(
        kernel,
        grid=(n_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale rows
            *extra_specs,                           # stacked lane consts
            pl.BlockSpec((Kx, Ky * Kz), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # ct (fetched once)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Ey
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Ez
        ],
        out_specs=pl.BlockSpec((chunk, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=vma_struct((n_pad, 3), jnp.float32, pos),
        interpret=interpret,
    )(pos, q, scal, *extra, ct.astype(jnp.float32), ey, ez)
    dpos = dpos[:n].astype(position.dtype)
    return (dpos, jnp.zeros_like(charge), jnp.zeros_like(box_L))


spread_grid_pallas.defvjp(_spread_fwd, _spread_bwd)


# XLA-spread dense-factor budgets: above these the (N, Ky*Kz) Khatri-Rao
# intermediate (2 HBM round-trips per force evaluation) is no longer worth
# its GEMM efficiency and the VMEM-resident Pallas spread takes over. The
# crossover depends on the kernel schedule, so there are two constants
# (all points measured on v5e, full force+energy evals,
# scripts/bench_spread_ab.py):
#
# - meshes where the lane-STACKED schedule applies (Kx+Ky+Kz <= 128,
#   e.g. 32^3): XLA wins at 25k (1.62 vs 2.00 ms) and 50k (2.16 vs
#   2.85), the kernel wins at 100k (4.67 vs 4.92 — the 410 MB factor
#   starts thrashing HBM superlinearly) => crossover ~350 MB.
# - per-axis meshes (64^3): XLA wins at 25k (2.91 vs 4.50), ties at 50k
#   (7.83 vs 7.80, 781 MB factor) => crossover ~768 MB; at 64^3/100k the
#   factor is 1.6 GB and the dense path is effectively unusable, so the
#   kernel is the scaling path for mesh-consistent large-N
#   electrostatics (VERDICT r2 item 2).
_DENSE_SPREAD_BUDGET_BYTES = 768 << 20
_DENSE_SPREAD_BUDGET_BYTES_STACKED = 350 << 20


def pallas_spread_ok(mesh, n=None, backend=None) -> bool:
    """Static predicate: is the Pallas spread applicable AND profitable?

    Default (env unset): AUTO — used only when the XLA path's dense
    (N, Ky*Kz) factor exceeds the measured crossover budget for the
    schedule the kernel would run (see the budget constants above) and
    the kernel's VMEM residency fits (grid + chunk buffer). Below the
    budget the XLA GEMM path measured faster at every probed scale, down
    to 50 vs 20 us at N=501 (call overhead). CAVMD_PPPM_PALLAS=1 forces
    the kernel on wherever applicable (used by tests/benchmarks).

    The env flag is read once at module import (_PALLAS_SPREAD_ENABLED):
    the result feeds functions cached by lru_cache and jit, so it must be
    process-constant — set CAVMD_PPPM_PALLAS before importing cavmd_tpu.
    """
    Kx, Ky, Kz = mesh
    if (Ky * Kz) % 128 != 0:
        return False
    if n is not None and n < 8192:
        return False
    # VMEM residency: accumulator grid + (chunk, Ky*Kz) B buffer well
    # under the ~16 MB budget; 64^3 fits (1 MB grid), 128^3 does not
    if Kx * Ky * Kz * 4 > (2 << 20):
        return False
    backend = backend or jax.default_backend()
    if backend != "tpu":
        return False
    if _PALLAS_SPREAD_MODE is not None:
        return _PALLAS_SPREAD_ENABLED
    dense_bytes = (n or 0) * Ky * Kz * 4
    budget = (_DENSE_SPREAD_BUDGET_BYTES_STACKED
              if _resolve_stacked(mesh, None)
              else _DENSE_SPREAD_BUDGET_BYTES)
    return dense_bytes > budget
