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

Everything is shape-static: scatter of N*p^3 weighted charges onto a
(K,K,K) grid, ``jnp.fft.fftn``, an elementwise Green's-function multiply
with precomputed influence coefficients, inverse FFT, and a gather. On a
sharded particle axis the grid contributions combine with one ``psum``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


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

    influence: jnp.ndarray  # (Kx,Ky,Kz) real coefficients c(m)
    kappa: jnp.ndarray  # splitting parameter
    volume: jnp.ndarray  # box volume
    # DFT matrices per axis (real/imag) — see pppm_reciprocal_energy notes
    dft_re: tuple  # of (K_d, K_d)
    dft_im: tuple

    @staticmethod
    def create(box_L, mesh=(32, 32, 32), order=6, kappa=0.2, dtype=None):
        box_np = np.asarray(box_L, dtype=float)
        c = influence_grid(box_np, mesh, order, float(kappa))
        dft_re, dft_im = [], []
        for K in mesh:
            m = np.arange(K)
            w = np.exp(-2j * np.pi * np.outer(m, m) / K)
            dft_re.append(jnp.asarray(w.real, dtype=dtype))
            dft_im.append(jnp.asarray(w.imag, dtype=dtype))
        return (
            PPPMParams(
                influence=jnp.asarray(c, dtype=dtype),
                kappa=jnp.asarray(kappa, dtype=dtype),
                volume=jnp.asarray(np.prod(box_np), dtype=dtype),
                dft_re=tuple(dft_re),
                dft_im=tuple(dft_im),
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
    w = [jnp.ones(sh, dtype)] + [jnp.zeros(sh, dtype) for _ in range(order - 1)]
    w_prev = None
    for n in range(2, order + 1):
        new = []
        for j in range(order):
            x = frac + j
            left = x * w[j]
            right = (n - x) * (w[j - 1] if j >= 1 else jnp.zeros(sh, dtype))
            new.append((left + right) / (n - 1))
        if n == order:
            w_prev = w
        w = new
    return jnp.stack(w, axis=-1), jnp.stack(w_prev, axis=-1)


def _spread_matrices(position, box_L, order: int, mesh):
    """Per-dimension spread matrices S_d (N, K_d) with the order-p B-spline
    weights placed at the wrapped stencil columns.

    TPU-native design note: naive charge spreading is N * p^3 scatter-adds
    (~755 us/step at N=501 on v5e, measured) because XLA serializes
    scatters. B-spline assignment is separable, so the grid is instead the
    contraction ``grid[x,y,z] = sum_i q_i Sx[i,x] Sy[i,y] Sz[i,z]`` — one
    (Kx, N) @ (N, Ky*Kz) matmul on the MXU plus cheap one-hot builds.
    (This mirrors the reference GPU's shared-memory tree reduction pivot —
    CavityForceComputeGPU.cu:323-377 — but for the mesh assignment.)
    """
    dtype = position.dtype
    Ks = jnp.asarray(mesh, dtype)
    box = jnp.asarray(box_L, dtype)

    u = (position / box + 0.5) * Ks  # (N,3) fractional grid coords in [0,K)
    k0 = jnp.floor(u)
    frac = u - k0
    base = k0.astype(jnp.int32)

    w, _ = bspline_weights(frac, order)  # (N,3,p)
    j = jnp.arange(order, dtype=jnp.int32)
    idx = (base[:, :, None] - j[None, None, :]) % jnp.asarray(
        mesh, jnp.int32
    )[None, :, None]  # (N,3,p)

    mats = []
    for d, K in enumerate(mesh):
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
        onehot = (idx[:, d, :, None] == cols).astype(dtype)  # (N,p,K)
        mats.append(jnp.einsum("njk,nj->nk", onehot, w[:, d],
                                precision=jax.lax.Precision.HIGHEST))
    return mats


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
    hp = jax.lax.Precision.HIGHEST  # TPU f32 matmul defaults to bf16
    grid = jnp.dot(A.T, B, precision=hp,
                   preferred_element_type=dtype).reshape(Kx, Ky, Kz)

    # 3-D DFT via per-axis matmuls with precomputed DFT matrices.
    # TPU-native design note: XLA's FFT costs ~44 us per 32^3 transform on
    # v5e (overhead-dominated at this size, measured); three axis
    # contractions with (K,K) DFT matrices are ~25 MFLOP on the MXU —
    # microseconds — and differentiate as plain matmuls.
    re, im = grid, None  # the charge grid is real: axis 0 needs 2 matmuls
    for axis in range(3):
        wr, wi = params.dft_re[axis], params.dft_im[axis]
        other = tuple(mesh[i] for i in range(3) if i != axis)
        re_m = jnp.moveaxis(re, axis, 0).reshape(mesh[axis], -1)
        if im is None:
            new_re = jnp.dot(wr, re_m, precision=hp,
                             preferred_element_type=dtype)
            new_im = jnp.dot(wi, re_m, precision=hp,
                             preferred_element_type=dtype)
        else:
            im_m = jnp.moveaxis(im, axis, 0).reshape(mesh[axis], -1)
            new_re = (
                jnp.dot(wr, re_m, precision=hp, preferred_element_type=dtype)
                - jnp.dot(wi, im_m, precision=hp, preferred_element_type=dtype)
            )
            new_im = (
                jnp.dot(wr, im_m, precision=hp, preferred_element_type=dtype)
                + jnp.dot(wi, re_m, precision=hp, preferred_element_type=dtype)
            )
        re = jnp.moveaxis(new_re.reshape(mesh[axis], *other), 0, axis)
        im = jnp.moveaxis(new_im.reshape(mesh[axis], *other), 0, axis)

    pref = 1.0 / (2.0 * jnp.pi * params.volume)
    energy = pref * jnp.sum(params.influence * (re * re + im * im))
    return energy.astype(dtype)


def pppm_force_and_energy(position, charge, box_L, params: PPPMParams, order: int, mesh):
    """Forces (exact -grad of the mesh energy) and reciprocal energy."""
    e, grad = jax.value_and_grad(pppm_reciprocal_energy)(
        position, charge, box_L, params, order, mesh
    )
    return -grad, e
