"""Pallas fused pair kernel vs the jnp fused path (interpret mode, f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
from cavmd_tpu.integrate import ForceField
from cavmd_tpu.ops.lj import fused_pair_force
from cavmd_tpu.ops.pallas_kernels import PallasPairPack, make_fused_pair_pallas


def test_pallas_pair_matches_jnp():
    snap = make_diatomic_system(40, box_L=28.0, seed=5)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=6
    )
    ff = ForceField.create(snap, coupling=1e-3, r_cut=12.0)
    pos32 = snap.position.astype(jnp.float32)
    box32 = snap.box_L.astype(jnp.float32)
    pair32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if x.dtype.kind == "f" else x,
        ff.lj_pair,
    )
    q = np.asarray(snap.charge)
    qq = q[:, None] * q[None, :]
    f_ref, elj_ref, eew_ref = fused_pair_force(
        pos32, box32, pair32, jnp.asarray(qq, jnp.float32),
        ff.coulomb_active, jnp.float32(ff.kappa), ff.coulomb_rcut,
    )

    pack = PallasPairPack.create(
        ff.lj_pair, qq, np.asarray(ff.coulomb_active),
        snap.N, tile=8,
    )
    run = make_fused_pair_pallas(
        pack, float(ff.kappa), ff.coulomb_rcut, tile=8, interpret=True
    )
    f, elj, eew = run(pos32, box32)

    scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(
        np.asarray(f), np.asarray(f_ref), atol=2e-6 * scale
    )
    # erfc approximation: 1.5e-7 absolute -> loose relative tolerance
    assert float(elj) == pytest.approx(float(elj_ref), rel=1e-5, abs=1e-9)
    assert float(eew) == pytest.approx(float(eew_ref), rel=1e-4, abs=1e-8)


def test_forcefield_pallas_mode():
    """ForceField(pair_mode='pallas') matches dense mode (f32, interpret on CPU).

    Note: the pallas path only replaces the LJ + Ewald-short pair pass."""
    import cavmd_tpu.ops.pallas_kernels as pk

    snap = make_diatomic_system(24, box_L=24.0, seed=9)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=10
    ).astype(jnp.float32)
    kw = dict(coupling=1e-3, r_cut=10.0, pppm_mesh=(8, 8, 8), dtype=jnp.float32)
    ff_dense = ForceField.create(snap, pair_mode="dense", **kw)
    ff_pallas = ForceField.create(snap, pair_mode="pallas", **kw)
    assert ff_pallas.pallas_pack is not None

    # interpret mode on CPU: patch the apply default
    orig = pk.pallas_pair_apply

    def apply_interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pk.pallas_pair_apply = apply_interp
    try:
        args = (snap.position, snap.image, snap.box_L, snap.charge,
                snap.typeid, snap.bond_group, snap.bond_typeid)
        f1, e1 = ff_dense.compute(*args)
        import cavmd_tpu.integrate.forcefield  # ensure same symbol  # noqa
        f2, e2 = ff_pallas.compute(*args)
    finally:
        pk.pallas_pair_apply = orig
    scale = float(jnp.abs(f1).max())
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=3e-6 * scale)
    assert float(e2["lj"]) == pytest.approx(float(e1["lj"]), rel=1e-4, abs=1e-8)


def test_pallas_cell_kernel_matches_xla():
    """Fused cell Pallas kernel (interpret mode) vs the XLA tile path:
    forces and both energies must agree to f32 roundoff."""
    from cavmd_tpu.ops.neighbor import (
        CellListConfig,
        build_cell_list,
        cell_pair_force,
        make_fused_cell_kernel,
    )
    from cavmd_tpu.ops.pallas_kernels import CellPallasPack, fused_cell_pallas

    snap = make_diatomic_system(60, box_L=40.0, temperature_K=100.0, seed=3)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=4
    )
    snap = snap.astype(jnp.float32)
    ff = ForceField.create(
        snap, coupling=1e-3, pair_mode="cell", r_cut=12.0,
        pppm_mesh=(8, 8, 8), dtype=jnp.float32,
    )
    assert ff.cell_pallas_pack is not None  # uniform cutoff -> pack built
    cfg = CellListConfig(*ff.cell_cfg)
    clist = build_cell_list(snap.position, snap.box_L, cfg, ff.cell_neighbors)

    kern = make_fused_cell_kernel(
        ff.lj_eps, ff.lj_sigma, ff.lj_rcut, ff.kappa, ff.n_types,
        uniform_rcut=ff.uniform_rcut,
    )
    f_ref, (elj_ref, eew_ref) = cell_pair_force(
        snap.position, snap.box_L, clist, cfg, kern,
        features=ff.cell_features, exclusions=ff.cell_exclusions,
        cell_block=ff.cell_block,
    )
    f_p, elj_p, eew_p = fused_cell_pallas(
        snap.position, snap.box_L, clist, cfg, ff.cell_pallas_pack,
        ff.kappa, interpret=True,
    )
    scale = float(jnp.abs(f_ref).max())
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_ref),
                               atol=2e-5 * scale)
    assert float(elj_p) == pytest.approx(float(elj_ref), rel=1e-5)
    assert float(eew_p) == pytest.approx(float(eew_ref), rel=1e-3, abs=1e-9)

    # column-resident variant (the large-N production kernel): same tile
    # math via a different j-side data path — must match the gather-based
    # kernel to f32 roundoff (summation order differs within the window)
    from cavmd_tpu.ops.pallas_kernels import fused_cell_cols_pallas

    assert min(cfg.ncells) >= 3
    f_c, elj_c, eew_c = fused_cell_cols_pallas(
        snap.position, snap.box_L, clist, cfg, ff.cell_pallas_pack,
        ff.kappa, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_p),
                               atol=2e-6 * scale)
    assert float(elj_c) == pytest.approx(float(elj_p), rel=1e-5)
    assert float(eew_c) == pytest.approx(float(eew_p), rel=1e-4, abs=1e-9)


def test_pallas_cols_two_tier_bit_identical():
    """The occupancy-predicated two-tier i-row split (s1) must not change
    FORCES at all: per-row arithmetic and lane-reduction order are
    identical, so any split point is bit-identical to single-tier.
    Energies accumulate into SMEM scalars per (tier, cell) tile — the
    grouping depends on s1, so they agree to f32 rounding, not bitwise."""
    from cavmd_tpu.ops.neighbor import CellListConfig, build_cell_list
    from cavmd_tpu.ops.pallas_kernels import fused_cell_cols_pallas

    snap = make_diatomic_system(60, box_L=40.0, temperature_K=100.0, seed=3)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=4
    )
    snap = snap.astype(jnp.float32)
    ff = ForceField.create(
        snap, coupling=1e-3, pair_mode="cell", r_cut=12.0,
        pppm_mesh=(8, 8, 8), dtype=jnp.float32,
    )
    cfg = CellListConfig(*ff.cell_cfg)
    clist = build_cell_list(snap.position, snap.box_L, cfg, ff.cell_neighbors)
    occ = np.asarray(jnp.sum(clist.bucket_idx < snap.N, axis=1))
    assert occ.max() > 8, "test system must exercise tier 2"

    outs = {}
    for s1 in (8, 16, cfg.cap):
        outs[s1] = fused_cell_cols_pallas(
            snap.position, snap.box_L, clist, cfg, ff.cell_pallas_pack,
            ff.kappa, interpret=True, s1=s1,
        )
    ref = outs[cfg.cap]  # single-tier
    for s1 in (8, 16):
        np.testing.assert_array_equal(np.asarray(outs[s1][0]),
                                      np.asarray(ref[0]))
        assert float(outs[s1][1]) == pytest.approx(float(ref[1]), rel=1e-6)
        assert float(outs[s1][2]) == pytest.approx(float(ref[2]),
                                                   rel=1e-6, abs=1e-10)


def test_pallas_cols_jsplit_matches():
    """Two-capacity-class j-windows (round 3): class-B tiles run only for
    cells whose 27-neighborhood overflows the split slot cap1. Forces
    regroup (A-sum + B-sum), so the split kernel matches the
    single-window kernel to f32 regrouping accuracy — and ``jsplit`` past
    ``cap - 8`` must disable the split (bitwise-equal path)."""
    from cavmd_tpu.ops.neighbor import CellListConfig, build_cell_list
    from cavmd_tpu.ops.pallas_kernels import fused_cell_cols_pallas

    snap = make_diatomic_system(60, box_L=40.0, temperature_K=100.0, seed=3)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=4
    ).astype(jnp.float32)
    ff = ForceField.create(
        snap, coupling=1e-3, pair_mode="cell", r_cut=12.0,
        pppm_mesh=(8, 8, 8), dtype=jnp.float32,
    )
    cfg = CellListConfig(*ff.cell_cfg)
    clist = build_cell_list(snap.position, snap.box_L, cfg, ff.cell_neighbors)
    occ = np.asarray(jnp.sum(clist.bucket_idx < snap.N, axis=1))
    assert occ.max() > 8, "test system must make class B fire"

    args = (snap.position, snap.box_L, clist, cfg, ff.cell_pallas_pack,
            ff.kappa)
    ref = fused_cell_cols_pallas(*args, interpret=True, jsplit=0)
    scale = float(jnp.abs(ref[0]).max())
    for js in (None, 8):
        out = fused_cell_cols_pallas(*args, interpret=True, jsplit=js)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                                   atol=1e-6 * scale)
        assert float(out[1]) == pytest.approx(float(ref[1]), rel=1e-5)
        assert float(out[2]) == pytest.approx(float(ref[2]),
                                              rel=1e-4, abs=1e-9)
    # split slot leaving a tail class thinner than 8 -> single window,
    # bit-identical to jsplit=0
    thin = fused_cell_cols_pallas(*args, interpret=True, jsplit=cfg.cap - 4)
    np.testing.assert_array_equal(np.asarray(thin[0]), np.asarray(ref[0]))


def test_zsort_cols_kernel_matches_xla():
    """The z-sorted column kernel (round 3): forces/energies must match the
    XLA bucket-tile path at build positions AND after drift (re-wraps
    included) — the pruned candidate window must stay exact under motion
    between rebuilds (live-z block bounds + circular overlap test)."""
    from cavmd_tpu.ops.neighbor import (
        CellListConfig,
        build_cell_list,
        build_zcol_list,
        cell_pair_force,
        make_fused_cell_kernel,
        plan_zcolumns,
    )
    from cavmd_tpu.ops.pallas_kernels import fused_zsort_cols_pallas

    snap = make_diatomic_system(60, box_L=40.0, temperature_K=100.0, seed=3)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=4
    ).astype(jnp.float32)
    ff = ForceField.create(
        snap, coupling=1e-3, pair_mode="cell", r_cut=12.0,
        pppm_mesh=(8, 8, 8), dtype=jnp.float32,
    )
    cfg = CellListConfig(*ff.cell_cfg)
    kern = make_fused_cell_kernel(
        ff.lj_eps, ff.lj_sigma, ff.lj_rcut, ff.kappa, ff.n_types,
        uniform_rcut=ff.uniform_rcut,
    )
    zcfg = plan_zcolumns(np.asarray(snap.box_L), 12.0, n=snap.N)
    assert zcfg.cap % 128 == 0
    zlist = build_zcol_list(snap.position, snap.box_L, zcfg)
    assert not bool(zlist.overflow)

    # drift schedule honoring the carried-list validity contract: TOTAL
    # per-particle displacement since the build stays < skin/2 (beyond
    # that the rebuild trigger fires in production and the 9-column halo
    # coverage guarantee no longer holds — an earlier version accumulated
    # 0.49 skin PER trial and passed only by luck of the seed)
    rng = np.random.default_rng(0)
    pos0 = snap.position
    direction = rng.uniform(-1, 1, size=(snap.N, 3)).astype(np.float32)
    direction *= 0.49 * zcfg.skin / np.abs(direction).max()
    box = np.asarray(snap.box_L)
    pos = pos0
    for trial in range(3):
        # reference at the CURRENT positions via a fresh bucket list
        clist = build_cell_list(pos, snap.box_L, cfg, ff.cell_neighbors)
        f_ref, (elj_ref, eew_ref) = cell_pair_force(
            pos, snap.box_L, clist, cfg, kern,
            features=ff.cell_features, exclusions=ff.cell_exclusions,
            cell_block=ff.cell_block,
        )
        # zcol kernel against the STALE build-time zlist (drift trials)
        f_z, elj_z, eew_z, win_ovf = fused_zsort_cols_pallas(
            pos, snap.box_L, zlist, zcfg, ff.cell_pallas_pack,
            ff.kappa, interpret=True,
        )
        assert not bool(win_ovf)
        scale = float(jnp.abs(f_ref).max())
        np.testing.assert_allclose(
            np.asarray(f_z), np.asarray(f_ref), atol=2e-5 * scale
        )
        assert float(elj_z) == pytest.approx(float(elj_ref), rel=1e-5)
        assert float(eew_z) == pytest.approx(
            float(eew_ref), rel=1e-3, abs=1e-9
        )
        # advance the TOTAL drift to (trial+1)/3 x 0.49 skin from the
        # build positions and re-wrap into the box (the zlist stays
        # anchored at the build positions, as during carried-list steps;
        # re-wrapping exercises the drift-continuous local coordinates)
        pos = pos0 + jnp.asarray(direction) * ((trial + 1) / 3.0)
        pos = pos - jnp.asarray(box) * jnp.round(pos / jnp.asarray(box))


def test_forcefield_zcol_mode_trajectory():
    """pair_mode='zcol' end-to-end (interpret on CPU): a 40-step NVE
    trajectory with the carried, displacement-rebuilt column list matches
    pair_mode='cell' (force deviations sit below f32 position ulp at this
    scale, so positions agree essentially exactly)."""
    from cavmd_tpu.integrate.integrator import (
        MethodSpec, init_state, make_step_fn, resolve_methods, run_steps,
    )

    traj = {}
    for mode in ("cell", "zcol"):
        snap = make_diatomic_system(
            60, box_L=40.0, temperature_K=100.0, seed=3
        )
        snap = add_cavity_particle(
            snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0,
            seed=4,
        ).astype(jnp.float32)
        ff = ForceField.create(
            snap, coupling=1e-3, pair_mode=mode, r_cut=12.0,
            pppm_mesh=(8, 8, 8), dtype=jnp.float32,
        )
        methods = resolve_methods(
            snap, (MethodSpec(kind="nve", group="all"),), ff.l_typeid
        )
        step = jax.jit(make_step_fn(ff, methods))
        state = init_state(snap, ff, dt=10.0, seed=1)
        state, obs = run_steps(step, state, 40)
        assert float(np.asarray(obs["cell_overflow"]).max()) == 0.0
        traj[mode] = np.asarray(state.position)
    dev = np.abs(traj["zcol"] - traj["cell"]).max()
    assert dev < 1e-3, dev


def test_lj_factorization_exact_and_fallback():
    """The joint congruence factorization (CellPallasPack round 3) must
    reproduce BOTH active-type tables essentially exactly for the
    benchmark parameters, and must fall back to one-hot rows when the
    sig^2 table is not positive definite."""
    from cavmd_tpu.core.system import LJ_PARAMS
    from cavmd_tpu.ops.pallas_kernels import _factor_lj_tables

    e_oo = LJ_PARAMS[("O", "O")]["epsilon"]
    e_nn = LJ_PARAMS[("N", "N")]["epsilon"]
    e_no = LJ_PARAMS[("N", "O")]["epsilon"]
    s_oo = LJ_PARAMS[("O", "O")]["sigma"] ** 2
    s_nn = LJ_PARAMS[("N", "N")]["sigma"] ** 2
    s_no = LJ_PARAMS[("N", "O")]["sigma"] ** 2
    E = np.array([[e_oo, e_no], [e_no, e_nn]])
    S = np.array([[s_oo, s_no], [s_no, s_nn]])
    lam, G = _factor_lj_tables(E, S)
    assert lam is not None
    G32 = G.astype(np.float32).astype(np.float64)
    np.testing.assert_allclose(G32 @ G32.T, S, atol=1e-6 * S.max())
    np.testing.assert_allclose(G32 @ np.diag(lam) @ G32.T, E,
                               atol=1e-6 * E.max())

    # rank-deficient sig^2 (all sigmas equal -> S is rank 1): no Cholesky,
    # the pack must fall back to the exact one-hot representation
    S_sing = np.full((2, 2), 30.0)
    lam_s, _ = _factor_lj_tables(E, S_sing)
    assert lam_s is None


def test_cell_kernel_factored_matches_onehot():
    """pair_mode='cell' Pallas kernel: the factored LJ rows must agree
    with the one-hot type-pair expansion to f32 roundoff on the same
    cell list (identical pair set, reconstructed parameters exact to
    ~1e-7 relative)."""
    from cavmd_tpu.ops import pallas_kernels as pk
    from cavmd_tpu.ops.neighbor import CellListConfig, build_cell_list

    snap = make_diatomic_system(60, box_L=40.0, temperature_K=100.0, seed=3)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=4
    ).astype(jnp.float32)
    ff = ForceField.create(
        snap, coupling=1e-3, pair_mode="cell", r_cut=12.0,
        pppm_mesh=(8, 8, 8), dtype=jnp.float32,
    )
    pack_f = ff.cell_pallas_pack
    assert pack_f.lam is not None, "benchmark tables must factorize"
    # rebuild the pack with the factorization disabled
    import os as _os

    _os.environ["CAVMD_LJ_FACTORED"] = "0"
    try:
        ff_1h = ForceField.create(
            snap, coupling=1e-3, pair_mode="cell", r_cut=12.0,
            pppm_mesh=(8, 8, 8), dtype=jnp.float32,
        )
    finally:
        del _os.environ["CAVMD_LJ_FACTORED"]
    pack_1h = ff_1h.cell_pallas_pack
    assert pack_1h.lam is None

    cfg = CellListConfig(*ff.cell_cfg)
    clist = build_cell_list(snap.position, snap.box_L, cfg, ff.cell_neighbors)
    f_f, elj_f, eew_f = pk.fused_cell_cols_pallas(
        snap.position, snap.box_L, clist, cfg, pack_f, ff.kappa,
        interpret=True,
    )
    f_1, elj_1, eew_1 = pk.fused_cell_cols_pallas(
        snap.position, snap.box_L, clist, cfg, pack_1h, ff.kappa,
        interpret=True,
    )
    scale = float(jnp.abs(f_1).max())
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_1),
                               atol=5e-6 * scale)
    assert float(elj_f) == pytest.approx(float(elj_1), rel=2e-5)
    assert float(eew_f) == pytest.approx(float(eew_1), rel=1e-6, abs=1e-10)
