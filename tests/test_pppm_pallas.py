"""Pallas PPPM spread kernel vs the XLA spread path (interpret mode, f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
from cavmd_tpu.ops.pppm import (
    PPPMParams,
    _mesh_energy,
    pppm_force_and_energy,
    pppm_reciprocal_energy,
)
from cavmd_tpu.ops.pppm_pallas import spread_grid_pallas


@pytest.fixture(scope="module")
def scene():
    snap = make_diatomic_system(40, box_L=28.0, temperature_K=100.0, seed=3)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=4
    ).astype(jnp.float32)
    mesh = (16, 16, 16)  # Ky*Kz = 256, multiple of 128
    params, order = PPPMParams.create(
        np.asarray(snap.box_L), mesh=mesh, order=6, kappa=0.35,
        dtype=jnp.float32,
    )
    pos = jnp.asarray(snap.position, jnp.float32)
    q = jnp.asarray(snap.charge, jnp.float32)
    box = jnp.asarray(snap.box_L, jnp.float32)
    return pos, q, box, params, order, mesh


def test_pallas_spread_energy_matches_xla(scene):
    pos, q, box, params, order, mesh = scene
    e_ref = pppm_reciprocal_energy(pos, q, box, params, order, mesh)

    grid = spread_grid_pallas(pos, q, box, order, mesh, 64, True)
    e_p = _mesh_energy(
        grid.reshape(mesh[0], 1, mesh[1], mesh[2]), params, mesh
    )[0]
    assert float(e_p) == pytest.approx(float(e_ref), rel=1e-5)


def test_pallas_spread_forces_match_xla_autodiff(scene):
    """The analytic custom_vjp must reproduce XLA's autodiff forces."""
    pos, q, box, params, order, mesh = scene
    f_ref, e_ref = pppm_force_and_energy(pos, q, box, params, order, mesh)

    def e_fn(p):
        grid = spread_grid_pallas(p, q, box, order, mesh, 64, True)
        return _mesh_energy(
            grid.reshape(mesh[0], 1, mesh[1], mesh[2]), params, mesh
        )[0]

    e_p, grad = jax.value_and_grad(e_fn)(pos)
    f_p = -grad
    scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref),
                               atol=2e-5 * scale)
    assert float(e_p) == pytest.approx(float(e_ref), rel=1e-5)


def test_pallas_spread_padding_invariant(scene):
    """Chunk padding (zero-charge rows) must not perturb the grid."""
    pos, q, box, params, order, mesh = scene
    g64 = spread_grid_pallas(pos, q, box, order, mesh, 64, True)
    g128 = spread_grid_pallas(pos, q, box, order, mesh, 128, True)
    np.testing.assert_allclose(np.asarray(g64), np.asarray(g128),
                               atol=1e-5 * float(jnp.abs(g64).max()))


def test_stacked_stencils_match_per_axis(scene):
    """The lane-stacked schedule (one Cox-de Boor recursion on the
    concatenated (chunk, Kx+Ky+Kz) window) must reproduce the per-axis
    kernel exactly: same grid forward, same analytic backward."""
    pos, q, box, params, order, mesh = scene
    g_ref = spread_grid_pallas(pos, q, box, order, mesh, 64, True, False)
    g_stk = spread_grid_pallas(pos, q, box, order, mesh, 64, True, True)
    np.testing.assert_allclose(np.asarray(g_stk), np.asarray(g_ref),
                               atol=1e-6 * float(jnp.abs(g_ref).max()))

    rng = np.random.default_rng(5)
    ct = jnp.asarray(rng.standard_normal(g_ref.shape), jnp.float32)
    d_ref = jax.vjp(
        lambda p: spread_grid_pallas(p, q, box, order, mesh, 64, True,
                                     False), pos)[1](ct)[0]
    d_stk = jax.vjp(
        lambda p: spread_grid_pallas(p, q, box, order, mesh, 64, True,
                                     True), pos)[1](ct)[0]
    scale = float(jnp.abs(d_ref).max())
    np.testing.assert_allclose(np.asarray(d_stk), np.asarray(d_ref),
                               atol=1e-5 * scale)


def test_stacked_noncubic_mesh_matches_dense():
    """Unequal Kx/Ky/Kz exercises the stacked lane-segment bookkeeping
    (per-lane K in the mod, zero-row blocks in the extended tables)."""
    mesh = (8, 16, 32)
    order = 6
    rng = np.random.default_rng(13)
    n = 48
    box = jnp.asarray([22.0, 30.0, 41.0], jnp.float32)
    pos = jnp.asarray(
        (rng.random((n, 3)) - 0.5) * np.asarray(box), jnp.float32
    )
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)

    grid = spread_grid_pallas(pos, q, box, order, mesh, 64, True, True)
    from cavmd_tpu.ops.pppm import _spread_matrices

    Sx, Sy, Sz = _spread_matrices(pos, box, order, mesh)
    ref = (q[:, None] * Sx).T @ (
        Sy[:, :, None] * Sz[:, None, :]
    ).reshape(n, -1)
    np.testing.assert_allclose(np.asarray(grid), np.asarray(ref),
                               atol=5e-5, rtol=0)

    ct = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    dpos = jax.vjp(
        lambda p: spread_grid_pallas(p, q, box, order, mesh, 64, True,
                                     True), pos)[1](ct)[0]

    def dense(p):
        Sx, Sy, Sz = _spread_matrices(p, box, order, mesh)
        return ((q[:, None] * Sx).T
                @ (Sy[:, :, None] * Sz[:, None, :]).reshape(n, -1))

    dref = jax.vjp(dense, pos)[1](ct)[0]
    scale = np.abs(np.asarray(dref)).max()
    np.testing.assert_allclose(
        np.asarray(dpos), np.asarray(dref), atol=3e-4 * scale, rtol=0
    )


def test_spread_noncubic_mesh_matches_xla():
    """Ky != Kz exercises the one-hot Khatri-Rao expansion tables'
    row/column indexing (m // Kz vs m % Kz) — a transposed table would
    still pass every cubic-mesh test."""
    mesh = (8, 16, 32)  # Ky*Kz = 512, multiple of 128
    order = 6
    rng = np.random.default_rng(7)
    n = 48
    box = jnp.asarray([22.0, 30.0, 41.0], jnp.float32)
    pos = jnp.asarray(
        (rng.random((n, 3)) - 0.5) * np.asarray(box), jnp.float32
    )
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)

    grid = spread_grid_pallas(pos, q, box, order, mesh, 64, True)
    from cavmd_tpu.ops.pppm import _spread_matrices

    Sx, Sy, Sz = _spread_matrices(pos, box, order, mesh)
    A = q[:, None] * Sx
    B = (Sy[:, :, None] * Sz[:, None, :]).reshape(n, -1)
    ref = A.T @ B
    np.testing.assert_allclose(np.asarray(grid), np.asarray(ref),
                               atol=5e-5, rtol=0)

    ct = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    dpos = jax.vjp(
        lambda p: spread_grid_pallas(p, q, box, order, mesh, 64, True),
        pos,
    )[1](ct)[0]

    def dense(p):
        Sx, Sy, Sz = _spread_matrices(p, box, order, mesh)
        return ((q[:, None] * Sx).T
                @ (Sy[:, :, None] * Sz[:, None, :]).reshape(n, -1))

    dref = jax.vjp(dense, pos)[1](ct)[0]
    scale = np.abs(np.asarray(dref)).max()
    np.testing.assert_allclose(
        np.asarray(dpos), np.asarray(dref), atol=3e-4 * scale, rtol=0
    )


def test_spread_64_mesh_matches_xla():
    """64^3 mesh through the Pallas spread (the mesh-consistent large-N
    configuration: the XLA path's dense (N, Ky*Kz) factor is 1.6 GB at
    100k and unusable) — grid and analytic backward match the XLA path."""
    mesh = (64, 64, 64)
    order = 6
    rng = np.random.default_rng(11)
    n = 64
    box = jnp.asarray([40.0, 40.0, 40.0], jnp.float32)
    pos = jnp.asarray(
        (rng.random((n, 3)) - 0.5) * np.asarray(box), jnp.float32
    )
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)

    grid = spread_grid_pallas(pos, q, box, order, mesh, 64, True)
    from cavmd_tpu.ops.pppm import _spread_matrices

    Sx, Sy, Sz = _spread_matrices(pos, box, order, mesh)
    A = q[:, None] * Sx
    B = (Sy[:, :, None] * Sz[:, None, :]).reshape(n, -1)
    ref = A.T @ B
    np.testing.assert_allclose(
        np.asarray(grid), np.asarray(ref), atol=5e-5,
        rtol=0,
    )

    ct = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    dpos = jax.vjp(
        lambda p: spread_grid_pallas(p, q, box, order, mesh, 64, True),
        pos,
    )[1](ct)[0]
    dref = jax.vjp(
        lambda p: (
            (q[:, None] * _spread_matrices(p, box, order, mesh)[0]).T
            @ (
                _spread_matrices(p, box, order, mesh)[1][:, :, None]
                * _spread_matrices(p, box, order, mesh)[2][:, None, :]
            ).reshape(n, -1)
        ),
        pos,
    )[1](ct)[0]
    scale = np.abs(np.asarray(dref)).max()
    np.testing.assert_allclose(
        np.asarray(dpos), np.asarray(dref), atol=3e-4 * scale, rtol=0
    )


def test_spread_gate_matches_measured_crossovers():
    """pallas_spread_ok encodes the measured v5e crossover points
    (scripts/bench_spread_ab.py, docs/performance.md): at 32^3 the
    stacked-schedule kernel wins only at 100k (dense factor 410 MB >
    350 MB budget); at 64^3 the per-axis kernel crosses near 781 MB.
    Pins the gate so a budget-constant regression is caught."""
    from cavmd_tpu.ops.pppm_pallas import pallas_spread_ok

    expected = {
        ((32,) * 3, 100_001): True,   # 410 MB, stacked: kernel 4.67 vs 4.92
        ((32,) * 3, 50_001): False,   # 195 MB, stacked: XLA 2.16 vs 2.85
        ((32,) * 3, 25_001): False,   # 98 MB, stacked: XLA 1.62 vs 2.00
        ((64,) * 3, 100_001): True,   # 1.6 GB: XLA path unusable
        ((64,) * 3, 50_001): True,    # 781 MB, per-axis: 7.83 vs 7.80 tie
        ((64,) * 3, 25_001): False,   # 391 MB, per-axis: XLA 2.91 vs 4.50
        ((32,) * 3, 501): False,      # below the 8192 applicability floor
    }
    for (mesh, n), want in expected.items():
        assert pallas_spread_ok(mesh, n=n, backend="tpu") is want, (mesh, n)
    # never on a non-TPU backend
    assert pallas_spread_ok((64,) * 3, n=100_001, backend="cpu") is False
