"""PPPM / smooth-PME reciprocal-space Coulomb solver on a 3D FFT mesh.

TPU-native rebuild of HOOMD's PPPM "Coulomb long" force (consumed surface,
SURVEY.md §2.3; configured at reference ``examples/05_advanced_run.py:598-604``
with resolution 32^3, order 6). Design differs deliberately from HOOMD's
ik-differentiation PPPM: we use the smooth particle-mesh Ewald formulation
(order-p cardinal B-spline charge assignment + Euler-spline reciprocal
correction factors), and obtain forces as the *exact* analytic gradient of
the mesh energy (analytic B-spline differentiation). This makes the
long-range force strictly conservative — the property the reference's
universe-energy oracle tests (``src/cavitymd/analysis.py:954-958``).

Everything is shape-static and gather/scatter-free: separable B-spline
assignment as one (Kx, N) @ (N, Ky*Kz) MXU contraction, the 3-D DFT as
per-axis matmuls with precomputed stacked half-spectrum DFT matrices (see
``_mesh_energy``), an elementwise influence multiply, and forces as the
autodiff gradient. On a sharded particle axis the grid contributions
combine with one ``psum``.

Mesh-resolution scaling: the reference driver runs resolution 32^3 at its
501-particle workload (05_advanced_run.py:601); ``resolution`` is a
PARAMETER there and here (``pppm_mesh`` / driver ``--pppm-resolution``),
and constant grid spacing at larger N means growing it ~N^(1/3). The
dense Khatri-Rao spread factor (N, Ky*Kz) grows with the mesh — 1.6 GB
at N=100k / 64^3 — so above a dense-factor budget the solver
auto-switches to the VMEM-resident Pallas spread kernel
(``ops/pppm_pallas.py:pallas_spread_ok``; bf16x3 dots, analytic vjp).
Accuracy A/B vs exact k-space Ewald: tests/test_ewald.py::
test_pppm_mesh_resolution_error_scaling (32^3 -> 64^3 cuts force error
>4x on a coarse-mesh box). VMEM caps the kernel at 64^3; beyond that
(and wherever the Pallas kernel is inapplicable but the dense factor is
too large) the solver scan-accumulates the grid over particle CHUNKS
(:func:`pppm_reciprocal_energy_chunked`) — same matmul math, the dense
factor never exists whole, so the mesh resolution has no ceiling (the
reference exposes ``resolution`` unbounded, 05_advanced_run.py:598-604).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Precision for the mesh matmuls (spread GEMM + stacked DFT). HIGH = bf16x3
# passes, which carries ~f32-native accuracy at half HIGHEST's (bf16x6)
# MXU cost. Measured on v5e f32 NVE (full force mix, 20k steps): total-
# energy drift 6.8e-4 Ha at HIGH vs 7.3e-4 at HIGHEST — the integrator's
# own f32 rounding dominates, so the cheaper pass count is free. The
# inputs to these matmuls are B-spline WEIGHTS (not raw positions); the
# bf16-rounding heating bug (ops/bonds.py) applied to position-carrying
# matmuls at DEFAULT (single-pass bf16) precision, a different regime.
_PPPM_PRECISION = jax.lax.Precision.HIGH

# The DFT stage gets its own knob because it looked like a candidate for
# single-pass bf16 (DEFAULT): its inputs are the spread charge grid, not
# position-carrying weights. Measured (v5e, N=501 vs f64 CPU truth):
# DEFAULT costs 100x in force accuracy — rel RMS reciprocal-force error
# 1.7e-3 vs 1.5e-5 at HIGH (the bf16 rounding of the grid does NOT
# average out through the quadratic influence sum) — for only ~35 us/step
# at B=8. HIGH stays; do not lower this without re-running that A/B.
_PPPM_DFT_PRECISION = jax.lax.Precision.HIGH


def bspline_int_values(p: int) -> np.ndarray:
    """M_p(1..p-1) — the order-p cardinal B-spline at interior integer nodes.

    Host-side helper for the Euler-spline b-factors.
    """
    # start from M_2 at its integer nodes: M_2(0)=0, M_2(1)=1, M_2(2)=0
    cur = np.zeros(3)
    cur[1] = 1.0
    for n in range(3, p + 1):
        nxt = np.zeros(n + 1)
        for k in range(n + 1):
            a = k / (n - 1) * (cur[k] if k <= n - 1 else 0.0)
            b = (n - k) / (n - 1) * (cur[k - 1] if 1 <= k <= n else 0.0)
            nxt[k] = a + b
        cur = nxt
    return cur  # cur[k] = M_p(k), k = 0..p


def influence_grid(box_L, mesh, order, kappa) -> np.ndarray:
    """Precompute the reciprocal influence coefficients c(m) (host-side).

    c(m) = exp(-pi^2 |m~|^2 / kappa^2) / |m~|^2 * prod_d 1/|D_d(m_d)|^2

    with m~_d = m'_d / L_d (m' the signed alias of the FFT index) and
    D_d(m) = sum_{k=0}^{p-2} M_p(k+1) exp(2 pi i m k / K_d) the Euler-spline
    denominator. The m = 0 mode and denominator zeros (even-order B-splines
    at the Nyquist mode) are zeroed.

    Reciprocal energy: E = 1/(2 pi V) * sum_m c(m) |FFT(Q)(m)|^2.
    """
    box_L = np.asarray(box_L, dtype=float)
    Kx, Ky, Kz = mesh
    mp_nodes = bspline_int_values(order)  # M_p(k), k=0..p

    def dsq(K):
        m = np.arange(K)
        ks = np.arange(order - 1)  # k = 0..p-2
        phase = np.exp(2j * np.pi * np.outer(m, ks) / K)
        D = phase @ mp_nodes[1:order]  # M_p(k+1), k=0..p-2
        return np.abs(D) ** 2

    dx, dy, dz = dsq(Kx), dsq(Ky), dsq(Kz)

    def alias(K):
        m = np.arange(K)
        return np.where(m <= K // 2, m, m - K)

    mx = alias(Kx)[:, None, None] / box_L[0]
    my = alias(Ky)[None, :, None] / box_L[1]
    mz = alias(Kz)[None, None, :] / box_L[2]
    m2 = mx**2 + my**2 + mz**2

    denom = dx[:, None, None] * dy[None, :, None] * dz[None, None, :]
    tiny = 1e-12
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.exp(-np.pi**2 * m2 / kappa**2) / m2 / np.maximum(denom, tiny)
    c[0, 0, 0] = 0.0
    c[denom < tiny] = 0.0
    return c


class PPPMParams(NamedTuple):
    """Static + precomputed data for the mesh solver (a pytree)."""

    # (Kx//2+1, Ky, Kz) HALF-SPECTRUM coefficients: the real charge grid
    # has Hermitian x-symmetry F(-m) = F*(m), so only Kx//2+1 x-frequency
    # rows are computed; conjugate-paired rows are folded in here as a
    # weight of 2 (1 on the self-conjugate m_x = 0 and Kx/2 planes)
    influence: jnp.ndarray
    kappa: jnp.ndarray  # splitting parameter
    volume: jnp.ndarray  # box volume
    # Stacked DFT matrices per axis — see _mesh_energy notes:
    # axis 0 (real input, half spectrum): (2*(K//2+1), K) [W_re; W_im]
    # axes 1,2 (complex):   (2K, 2K) [[W_re, -W_im], [W_im, W_re]]
    dft_stack: tuple

    @staticmethod
    def create(box_L, mesh=(32, 32, 32), order=6, kappa=0.2, dtype=None):
        box_np = np.asarray(box_L, dtype=float)
        c = influence_grid(box_np, mesh, order, float(kappa))
        Kxh = mesh[0] // 2 + 1
        weights = np.full(Kxh, 2.0)
        weights[0] = 1.0
        if mesh[0] % 2 == 0:
            weights[-1] = 1.0
        c_half = c[:Kxh] * weights[:, None, None]
        stacks = []
        for axis, K in enumerate(mesh):
            m = np.arange(K)
            w = np.exp(-2j * np.pi * np.outer(m, m) / K)
            if axis == 0:
                s = np.concatenate([w.real[:Kxh], w.imag[:Kxh]], axis=0)
            else:
                s = np.block([[w.real, -w.imag], [w.imag, w.real]])
            stacks.append(jnp.asarray(s, dtype=dtype))
        return (
            PPPMParams(
                influence=jnp.asarray(c_half, dtype=dtype),
                kappa=jnp.asarray(kappa, dtype=dtype),
                volume=jnp.asarray(np.prod(box_np), dtype=dtype),
                dft_stack=tuple(stacks),
            ),
            order,
        )


def bspline_weights(frac, order: int):
    """Order-p cardinal B-spline weights w_j = M_p(frac + j), j = 0..p-1.

    Built by the standard Cox–de Boor style recursion
    ``M_n(x) = [x M_{n-1}(x) + (n - x) M_{n-1}(x - 1)] / (n - 1)``.

    Args:
        frac: (...,) fractional offsets in [0, 1).
    Returns:
        (w, w_prev): weights of order p and order p-1 (the latter for
        analytic derivatives, ``M_p'(x) = M_{p-1}(x) - M_{p-1}(x-1)``).
    """
    dtype = frac.dtype
    sh = frac.shape
    # vectorized over the stencil axis: each recursion level is a handful
    # of whole-array ops on (..., p) instead of p scalar chains that XLA
    # re-assembles with 2p dynamic-update-slices at the end (measured ~4 us
    # + op-sequencing gaps per step at N=501 for the list formulation)
    x = frac[..., None] + jnp.arange(order, dtype=dtype)  # (..., p)
    w = jnp.zeros(sh + (order,), dtype).at[..., 0].set(1.0)
    w_prev = None
    zero = jnp.zeros(sh + (1,), dtype)
    for n in range(2, order + 1):
        shifted = jnp.concatenate([zero, w[..., :-1]], axis=-1)  # w[j-1]
        if n == order:
            w_prev = w
        w = (x * w + (n - x) * shifted) / (n - 1)
    return w, w_prev


def _spread_matrices(position, box_L, order: int, mesh):
    """Per-dimension spread matrices S_d (..., N, K_d) with the order-p
    B-spline weights placed at the wrapped stencil columns.

    TPU-native design notes (each measured on v5e):

    - naive charge spreading is N * p^3 scatter-adds (~755 us/step at
      N=501) because XLA serializes scatters. B-spline assignment is
      separable, so the grid is instead the contraction
      ``grid[x,y,z] = sum_i q_i Sx[i,x] Sy[i,y] Sz[i,z]`` — one
      (Kx, N) @ (N, Ky*Kz) matmul on the MXU plus cheap one-hot builds.
      (This mirrors the reference GPU's shared-memory tree reduction
      pivot — CavityForceComputeGPU.cu:323-377 — but for the mesh
      assignment.)
    - the one-hot + einsum formulation deliberately stays: the integer
      one-hot is an autodiff CONSTANT (floor has zero gradient), so the
      force backward flows only through the tiny (..., N, 3, p) weight
      recursion. A direct per-column B-spline evaluation looks leaner
      forward but backprops through (..., N, K) chains — measured 1.5x
      slower f+grad at B=8.

    Accepts any leading batch dims on ``position``; ``box_L`` must be
    broadcastable against its last axis.
    """
    dtype = position.dtype
    Ks = jnp.asarray(mesh, dtype)
    box = jnp.asarray(box_L, dtype)

    u = (position / box + 0.5) * Ks  # (...,N,3) grid coords in [0,K)
    k0 = jnp.floor(u)
    frac = u - k0
    base = k0.astype(jnp.int32)

    w, _ = bspline_weights(frac, order)  # (...,N,3,p)
    j = jnp.arange(order, dtype=jnp.int32)
    idx = (base[..., None] - j) % jnp.asarray(mesh, jnp.int32)[:, None]

    mats = []
    for d, K in enumerate(mesh):
        cols = jnp.arange(K, dtype=jnp.int32)
        onehot = (idx[..., d, :, None] == cols).astype(dtype)  # (...,N,p,K)
        mats.append(jnp.einsum("...jk,...j->...k", onehot, w[..., d, :],
                               precision=jax.lax.Precision.HIGHEST))
    return mats


def _mesh_energy(grid, params: PPPMParams, mesh):
    """Reciprocal energies from a real charge grid laid out (Kx, B, Ky, Kz).

    3-D DFT via per-axis matmuls with precomputed STACKED DFT matrices —
    one matmul per axis instead of 2-4:

    - axis 0 (real input): [W_re; W_im] (2K, K) @ grid (K, B*Ky*Kz);
    - axes 1, 2 (complex): [[W_re, -W_im], [W_im, W_re]] (2K, 2K) @
      [re; im] stacked along the contracted axis.

    TPU-native design notes (measured, v5e): XLA's FFT costs ~44 us per
    32^3 transform (overhead-dominated); separate re/im matmuls leave the
    (32, 32) LHS using a quarter of the MXU's 128 rows and pay the
    HIGHEST-precision pass count per op — stacking doubles row utilization
    and cuts op count ~3x. The batch dimension rides the matmul COLUMNS
    (B replicas = one matmul set, not B), which is why the replica-batched
    path (pppm_reciprocal_energy_batched) shares this core: batched and
    unbatched results are the same matmul columns, hence bit-identical.
    """
    dtype = grid.dtype
    Kx, Ky, Kz = mesh
    Kxh = Kx // 2 + 1  # Hermitian half spectrum of the real input
    hp = _PPPM_DFT_PRECISION

    # axis-0 transform: (2, Kxh, Kx) contracted with grid dim 0
    # -> (2, Kxh, B, Ky, Kz); the complex component rides a leading axis.
    # Only the half spectrum is carried — conjugate rows are folded into
    # the influence weights (see PPPMParams) — halving axis-1/2 work.
    s0 = params.dft_stack[0].reshape(2, Kxh, Kx)
    x = jax.lax.dot_general(
        s0, grid, (((2,), (0,)), ((), ())),
        precision=hp, preferred_element_type=dtype,
    )
    # axes 1,2: contract (complex, K) jointly with the (2,K',2,K) stack.
    # Each transformed axis lands at output position 1 and the remaining
    # dims keep their order — we track the layout instead of moving data
    # back (the moveaxis/concat round-trips cost ~2x the matmul time at
    # 32^3 x B=8, measured v5e). x layout after the loop:
    # (2, Kz', Ky', Kx', B).
    for i, (axis, K) in enumerate(((3, Ky), (4, Kz)), start=1):
        s = params.dft_stack[i].reshape(2, K, 2, K)
        x = jax.lax.dot_general(
            s, x, (((2, 3), (0, axis)), ((), ())),
            precision=hp, preferred_element_type=dtype,
        )

    pref = 1.0 / (2.0 * jnp.pi * params.volume)
    # influence transposed to the (Kz, Ky, Kx) layout of x (tiny constant)
    infl = jnp.transpose(params.influence, (2, 1, 0))[..., None]
    e = pref * jnp.sum(
        infl * jnp.sum(x * x, axis=0), axis=(0, 1, 2)
    )
    return e.astype(dtype)


@partial(jax.jit, static_argnames=("order", "mesh"))
def pppm_reciprocal_energy(position, charge, box_L, params: PPPMParams, order: int, mesh):
    """Reciprocal-space mesh energy (differentiable in ``position``).

    Forces come from ``jax.grad`` of this function — exactly conservative
    by construction (the autodiff transpose of the matmul contraction is
    itself a matmul: the force-interpolation gather). Self-energy /
    exclusion corrections are separate (:mod:`cavmd_tpu.ops.ewald`).
    """
    dtype = position.dtype
    Kx, Ky, Kz = mesh

    Sx, Sy, Sz = _spread_matrices(position, box_L, order, mesh)
    A = charge[:, None] * Sx  # (N,Kx)
    B = (Sy[:, :, None] * Sz[:, None, :]).reshape(-1, Ky * Kz)  # (N,Ky*Kz)
    hp = _PPPM_PRECISION
    grid = jnp.dot(A.T, B, precision=hp,
                   preferred_element_type=dtype).reshape(Kx, 1, Ky, Kz)
    return _mesh_energy(grid, params, mesh)[0]


def pppm_force_and_energy_pallas(position, charge, box_L,
                                 params: PPPMParams, order: int, mesh,
                                 chunk=None, stacked=None):
    """Forces + energy with the Pallas spread kernel (ops/pppm_pallas.py).

    Same DFT/influence core (:func:`_mesh_energy`); only the spreading
    stage differs — the (N, Ky*Kz) Khatri-Rao intermediate never touches
    HBM (410 MB/step at N=100k on the XLA path, measured). The spread's
    backward is an analytic custom_vjp, so ``value_and_grad`` works
    unchanged. ``chunk`` overrides the kernel's VMEM-budget auto size and
    ``stacked`` selects the lane-stacked stencil schedule — ``None``
    (default) picks it automatically where the stacked lane window fits
    128 lanes (scripts/bench_spread_ab.py sweeps both through this one
    production entry point).
    """
    from cavmd_tpu.ops.pppm_pallas import spread_grid_pallas

    Kx, Ky, Kz = mesh

    def e_fn(p):
        grid = spread_grid_pallas(p, charge, box_L, order, tuple(mesh),
                                  chunk, False, stacked)
        return _mesh_energy(
            grid.reshape(Kx, 1, Ky, Kz), params, mesh
        )[0].astype(position.dtype)

    e, grad = jax.value_and_grad(e_fn)(position)
    return -grad, e


def pppm_force_and_energy(position, charge, box_L, params: PPPMParams, order: int, mesh):
    """Forces (exact -grad of the mesh energy) and reciprocal energy."""
    e, grad = jax.value_and_grad(pppm_reciprocal_energy)(
        position, charge, box_L, params, order, mesh
    )
    return -grad, e


# ------------------------------------------------------------- chunked path
# One-GEMM spread above this dense-factor size switches to the chunked
# scan (1 GB: the 64^3/N=100k factor is 1.6 GB and already measured
# unusable; on TPU that regime normally takes the Pallas kernel instead,
# so this path serves (a) meshes past the kernel's 64^3 VMEM cap and
# (b) non-TPU backends at large N x mesh).
_DENSE_SPREAD_CEILING_BYTES = 1 << 30


def _spread_chunk_rows(mesh):
    """Particle rows per scan chunk: ~64 MB of (chunk, Ky*Kz) f32
    intermediate, clamped to [256, 8192] (pow2 so the GEMM contraction
    dim stays MXU-aligned). 1024 at 128^3, 4096 at 64^3."""
    kyz = mesh[1] * mesh[2]
    c = (64 << 20) // (kyz * 4)
    c = 1 << max(8, min(13, c.bit_length() - 1))
    return c


def _spread_grid_chunked(position, charge, box_L, order: int, mesh,
                         chunk: int):
    """Charge grid (Kx, Ky*Kz) by ``lax.scan`` over particle chunks.

    Same contraction as the one-GEMM spread (grid = A^T B with A the
    charge-weighted x-stencils and B the y(x)z Khatri-Rao factor) and the
    same per-column accumulation order within a chunk, but B only ever
    exists (chunk, Ky*Kz) at a time — the dense factor that caps the
    one-GEMM path (6.5 GB at N=100k/128^3) is streamed, not held.
    ``jax.checkpoint`` on the body keeps the BACKWARD from saving every
    chunk's B (which would be the dense factor in HBM again): the spread
    matrices are recomputed per chunk in the bwd sweep, trading one extra
    stencil evaluation for O(N * Ky*Kz) residual memory.

    Padded filler rows carry q=0, so A's filler rows are zero and
    contribute nothing to the grid (their position cotangents are zero
    and are sliced off by the pad's own autodiff transpose).
    """
    dtype = position.dtype
    Kx, Ky, Kz = mesh
    n = position.shape[0]
    pad = (-n) % chunk
    pos = jnp.concatenate(
        [position, jnp.zeros((pad, 3), dtype)]) if pad else position
    q = jnp.concatenate(
        [charge, jnp.zeros((pad,), charge.dtype)]) if pad else charge
    hp = _PPPM_PRECISION

    @jax.checkpoint
    def body(grid, pq):
        p, qc = pq
        Sx, Sy, Sz = _spread_matrices(p, box_L, order, mesh)
        A = qc[:, None] * Sx  # (chunk, Kx)
        B = (Sy[:, :, None] * Sz[:, None, :]).reshape(chunk, Ky * Kz)
        g = jnp.dot(A.T, B, precision=hp, preferred_element_type=dtype)
        return grid + g, None

    grid0 = jnp.zeros((Kx, Ky * Kz), dtype)
    grid, _ = jax.lax.scan(
        body, grid0,
        (pos.reshape(-1, chunk, 3), q.reshape(-1, chunk)),
    )
    return grid


@partial(jax.jit, static_argnames=("order", "mesh", "chunk"))
def pppm_reciprocal_energy_chunked(position, charge, box_L,
                                   params: PPPMParams, order: int, mesh,
                                   chunk: int = None):
    """Reciprocal mesh energy via the chunk-streamed spread.

    Numerically identical math to :func:`pppm_reciprocal_energy` (the
    grid is the same sum, accumulated chunk-major instead of in one
    GEMM's internal order), differentiable in ``position``.
    """
    Kx, Ky, Kz = mesh
    if chunk is None:
        chunk = _spread_chunk_rows(mesh)
    grid = _spread_grid_chunked(position, charge, box_L, order, mesh,
                                chunk)
    return _mesh_energy(grid.reshape(Kx, 1, Ky, Kz), params, mesh)[0]


def pppm_force_and_energy_chunked(position, charge, box_L,
                                  params: PPPMParams, order: int, mesh,
                                  chunk: int = None):
    """Forces + energy through the chunk-streamed spread."""
    e, grad = jax.value_and_grad(pppm_reciprocal_energy_chunked)(
        position, charge, box_L, params, order, mesh, chunk
    )
    return -grad, e


# --------------------------------------------------------------- batched path
def _spread_matrices_batched(position, box_L, order: int, mesh):
    """(B, N, 3) variant of :func:`_spread_matrices` -> three (B, N, K_d)."""
    box = jnp.asarray(box_L, position.dtype)
    if box.ndim > 1:
        box = box[:, None, :]  # per-replica boxes broadcast over N
    return _spread_matrices(position, box, order, mesh)


@partial(jax.jit, static_argnames=("order", "mesh"))
def pppm_reciprocal_energy_batched(position, charge, box_L, params: PPPMParams,
                                   order: int, mesh):
    """Replica-batched mesh energy: (B, N, 3) positions -> (B,) energies.

    TPU-native design note (VERDICT r1 item 4): under plain ``vmap`` the
    per-axis DFT contractions become B tiny (K,K)@(K,K^2) matmuls each —
    measured 2.6x the B=1 cost at B=8 on v5e, because every one is a
    separate overhead-bound MXU op. Here the replica axis is FOLDED INTO
    THE COLUMN DIMENSION of each shared-matrix contraction,
    (K,K)@(K, B*K^2), so B replicas ride one matmul set. Per-column
    accumulation order is identical to the unbatched kernel, so results
    match the B=1 path bit-for-bit. The charge spreading keeps a genuinely
    batched GEMM (its contraction differs per replica) — that part is
    FLOP-bound, not overhead-bound.

    Requires every replica to share the same box (the replica-batch
    use case: one scene, many trajectories).
    """
    dtype = position.dtype
    B = position.shape[0]
    Kx, Ky, Kz = mesh
    hp = _PPPM_PRECISION

    Sx, Sy, Sz = _spread_matrices_batched(position, box_L, order, mesh)
    A = charge[..., None] * Sx  # (B,N,Kx)
    Bm = (Sy[..., :, None] * Sz[..., None, :]).reshape(
        B, -1, Ky * Kz
    )  # (B,N,Ky*Kz)
    # grid laid out (Kx, B, Ky*Kz): the replica axis sits in the DFT matmul
    # columns from the start — no transpose before the axis-0 contraction
    grid = jnp.einsum("bnx,bnm->xbm", A, Bm, precision=hp,
                      preferred_element_type=dtype)
    return _mesh_energy(grid.reshape(Kx, B, Ky, Kz), params, mesh)


@partial(jax.jit, static_argnames=("order", "mesh"))
def pppm_force_and_energy_batched(position, charge, box_L,
                                  params: PPPMParams, order: int, mesh):
    """Batched forces + energies: (B,N,3) -> ((B,N,3), (B,))."""
    e, vjp = jax.vjp(
        lambda p: pppm_reciprocal_energy_batched(
            p, charge, box_L, params, order, mesh
        ),
        position,
    )
    # replicas are independent: the vjp with a ones cotangent is the
    # per-replica gradient stack
    (grad,) = vjp(jnp.ones_like(e))
    return -grad, e


@lru_cache(maxsize=8)
def make_pppm_force_energy(order: int, mesh):
    """Build the vmap-aware PPPM force+energy op.

    Unbatched calls run :func:`pppm_force_and_energy`. Under ``jax.vmap``
    (the replica-parallel step, parallel/replicas.py) a ``custom_vmap``
    rule swaps in the replica-folded batched kernel instead of letting
    vmap shred the DFT into B tiny matmuls. Bit-identical results either
    way (see pppm_reciprocal_energy_batched).
    """
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def fe(position, charge, box_L, params):
        from cavmd_tpu.ops.pppm_pallas import pallas_spread_ok

        if (pallas_spread_ok(mesh, n=position.shape[0])
                and position.dtype == jnp.float32):
            return pppm_force_and_energy_pallas(
                position, charge, box_L, params, order, mesh
            )
        if (position.shape[0] * mesh[1] * mesh[2] * 4
                > _DENSE_SPREAD_CEILING_BYTES):
            # dense factor too large to hold and the Pallas kernel is
            # inapplicable (mesh past its 64^3 VMEM cap, or a non-TPU
            # backend): stream the spread over particle chunks
            return pppm_force_and_energy_chunked(
                position, charge, box_L, params, order, mesh
            )
        return pppm_force_and_energy(position, charge, box_L, params,
                                     order, mesh)

    @fe.def_vmap
    def _fe_vmap(axis_size, in_batched, position, charge, box_L, params):
        pos_b, q_b, box_b, params_b = in_batched
        if any(jax.tree_util.tree_leaves(params_b)) or not pos_b:
            # params batched (not the replica use case): fall back to a
            # plain per-example loop over broadcast inputs
            def bcast(x, b):
                return jax.tree_util.tree_map(
                    lambda leaf, lb: leaf if lb else jnp.broadcast_to(
                        leaf, (axis_size,) + leaf.shape
                    ),
                    x, b,
                )
            f, e = jax.lax.map(
                lambda args: pppm_force_and_energy(*args, order, mesh),
                (bcast(position, pos_b), bcast(charge, q_b),
                 bcast(box_L, box_b), bcast(params, params_b)),
            )
            return (f, e), (True, True)
        if not q_b:
            charge = jnp.broadcast_to(charge, (axis_size,) + charge.shape)
        if box_b:
            # the batched kernel folds all replicas into shared-matrix DFT
            # columns, which is only valid when every replica shares one
            # box (the influence coefficients in `params` are box-specific
            # anyway). Poison the result with NaN if the boxes differ —
            # a silent wrong-box spread would corrupt forces invisibly,
            # and data-dependent branching is not available under jit.
            box0 = box_L[0]
            mismatch = jnp.max(jnp.abs(box_L - box_L[0:1]))
            poison = jnp.where(mismatch > 0, jnp.nan, 0.0).astype(
                position.dtype
            )
        else:
            box0 = box_L
            poison = jnp.zeros((), position.dtype)
        if (axis_size * position.shape[1] * mesh[1] * mesh[2] * 4
                > _DENSE_SPREAD_CEILING_BYTES):
            # the batched kernel's (B, N, Ky*Kz) factor is B x the
            # unbatched one — stream replicas through the chunked spread
            f, e = jax.lax.map(
                lambda pq: pppm_force_and_energy_chunked(
                    pq[0], pq[1], box0, params, order, mesh
                ),
                (position, charge),
            )
        else:
            f, e = pppm_force_and_energy_batched(
                position, charge, box0, params, order, mesh
            )
        return (f + poison, e + poison), (True, True)

    return fe
