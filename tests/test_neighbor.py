"""Cell-list neighbor path: must match the dense all-pairs path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavmd_tpu.core import make_diatomic_system
from cavmd_tpu.core.system import LJ_PARAMS
from cavmd_tpu.ops.lj import (
    bond_exclusion_mask,
    lj_dense,
    lj_pair_tables,
)
from cavmd_tpu.ops.ewald import ewald_real_space
from cavmd_tpu.ops.neighbor import (
    build_cell_list,
    cell_pair_force,
    exclusion_table,
    make_ewald_cell_kernel,
    make_lj_cell_kernel,
    make_particle_features,
    neighbor_cell_table,
    plan_cells,
)


@pytest.fixture(scope="module")
def setup():
    snap = make_diatomic_system(120, box_L=60.0, seed=77)
    r_cut = 12.0
    cfg = plan_cells(snap.box_L, r_cut, skin=2.0, n=snap.N)
    assert min(cfg.ncells) >= 3, cfg
    nct = neighbor_cell_table(cfg.ncells)
    clist = build_cell_list(snap.position, snap.box_L, cfg, nct)
    assert not bool(clist.overflow)
    return snap, r_cut, cfg, clist


def test_bucket_partition(setup):
    """Every particle appears in exactly one bucket slot."""
    snap, r_cut, cfg, clist = setup
    ids = np.asarray(clist.bucket_idx).ravel()
    real = ids[ids < snap.N]
    assert len(real) == snap.N
    assert len(np.unique(real)) == snap.N


def test_lj_cell_matches_dense(setup):
    snap, r_cut, cfg, clist = setup
    eps, sig, rcut_t = lj_pair_tables(
        list(snap.types), {k: dict(**v, r_cut=r_cut) for k, v in LJ_PARAMS.items()}
    )
    excl_dense = bond_exclusion_mask(snap.N, snap.bond_group)
    f_ref, e_ref = lj_dense(
        snap.position, snap.box_L, snap.typeid, eps, sig, rcut_t, excl_dense
    )

    feats = make_particle_features(snap.typeid, snap.charge, len(snap.types))
    kern = make_lj_cell_kernel(eps, sig, rcut_t, len(snap.types))
    excl = jnp.asarray(exclusion_table(snap.N, snap.bond_group))
    f, e = cell_pair_force(
        snap.position, snap.box_L, clist, cfg, kern,
        features=feats, exclusions=excl,
    )
    assert float(e) == pytest.approx(float(e_ref), rel=1e-10, abs=1e-14)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=1e-11)


def test_ewald_cell_matches_dense(setup):
    snap, r_cut, cfg, clist = setup
    kappa = 0.3
    excl_dense = bond_exclusion_mask(snap.N, snap.bond_group)
    f_ref, e_ref = ewald_real_space(
        snap.position, snap.box_L, snap.charge, kappa, r_cut, excl_dense
    )
    feats = make_particle_features(snap.typeid, snap.charge, len(snap.types))
    kern = make_ewald_cell_kernel(kappa, len(snap.types))
    excl = jnp.asarray(exclusion_table(snap.N, snap.bond_group))
    f, e = cell_pair_force(
        snap.position, snap.box_L, clist, cfg, kern,
        features=feats, exclusions=excl,
    )
    assert float(e) == pytest.approx(float(e_ref), rel=1e-10)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=1e-11)


def test_overflow_detection():
    """Cramming many particles into one cell must raise the overflow flag."""
    pos = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (50, 3)))
    box = jnp.asarray([40.0, 40.0, 40.0])
    cfg = plan_cells(box, 10.0, skin=0.0, cap=8)
    nct = neighbor_cell_table(cfg.ncells)
    clist = build_cell_list(pos, box, cfg, nct)
    assert bool(clist.overflow)

    # slot ownership under overflow: each bucket slot is owned by exactly
    # the particle bucket_idx points at; every displaced particle maps to
    # the dump slot (a force gather must read zeros, not another
    # particle's force row)
    flat_idx = np.asarray(clist.bucket_idx).reshape(-1)
    slot_of = np.asarray(clist.slot_of)
    dump = clist.bucket_idx.size
    n = pos.shape[0]
    owners = 0
    for p in range(n):
        s = slot_of[p]
        if s == dump:
            continue
        assert flat_idx[s] == p
        owners += 1
    assert owners == np.sum(flat_idx < n)  # every filled slot has an owner


def test_cell_list_under_jit(setup):
    """Build + force must compose under jit (shape-static everywhere)."""
    snap, r_cut, cfg, clist = setup
    eps, sig, rcut_t = lj_pair_tables(
        list(snap.types), {k: dict(**v, r_cut=r_cut) for k, v in LJ_PARAMS.items()}
    )
    feats = make_particle_features(snap.typeid, snap.charge, len(snap.types))
    kern = make_lj_cell_kernel(eps, sig, rcut_t, len(snap.types))
    nct = jnp.asarray(neighbor_cell_table(cfg.ncells))

    @jax.jit
    def full(pos):
        cl = build_cell_list(pos, snap.box_L, cfg, nct)
        f, e = cell_pair_force(pos, snap.box_L, cl, cfg, kern, features=feats)
        return f, e, cl.overflow

    f, e, ov = full(snap.position)
    assert not bool(ov)
    assert np.isfinite(float(e))


def test_forcefield_cell_mode_matches_dense():
    """ForceField(pair_mode='cell') must reproduce dense-mode forces."""
    from cavmd_tpu.integrate import ForceField
    from cavmd_tpu.core import add_cavity_particle

    snap = make_diatomic_system(100, box_L=60.0, seed=99)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=100
    )
    kw = dict(coupling=1e-3, r_cut=12.0, pppm_mesh=(16, 16, 16))
    ff_dense = ForceField.create(snap, pair_mode="dense", **kw)
    ff_cell = ForceField.create(snap, pair_mode="cell", **kw)
    args = (snap.position, snap.image, snap.box_L, snap.charge, snap.typeid,
            snap.bond_group, snap.bond_typeid)
    f1, e1 = ff_dense.compute(*args)
    f2, e2 = ff_cell.compute(*args)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-11)
    for k in e1:
        assert float(e1[k]) == pytest.approx(float(e2[k]), rel=1e-10, abs=1e-13)


def test_small_cell_grid_no_double_count():
    """Regression (review finding): with < 3 cells per dimension, wrapped
    neighbor offsets collide; duplicates must be deduped, not double-counted."""
    from cavmd_tpu.integrate import ForceField

    snap = make_diatomic_system(60, box_L=34.0, seed=123)  # ncells = 2 per dim
    kw = dict(r_cut=15.0, pppm_mesh=(16, 16, 16), enable_cavity=False)
    ff_dense = ForceField.create(snap, pair_mode="dense", **kw)
    ff_cell = ForceField.create(snap, pair_mode="cell", **kw)
    from cavmd_tpu.ops.neighbor import CellListConfig

    assert min(CellListConfig(*ff_cell.cell_cfg).ncells) < 3
    args = (snap.position, snap.image, snap.box_L, snap.charge, snap.typeid,
            snap.bond_group, snap.bond_typeid)
    f1, e1 = ff_dense.compute(*args)
    f2, e2 = ff_cell.compute(*args)
    assert float(e1["lj"]) == pytest.approx(float(e2["lj"]), rel=1e-10)
    assert float(e1["ewald_short"]) == pytest.approx(
        float(e2["ewald_short"]), rel=1e-10)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-11)


def test_carried_cell_list_trajectory_matches_per_step_rebuild():
    """skin > 0 (carried CellList, displacement-triggered rebuilds) must
    produce the same trajectory as skin = 0 (per-step rebuild) — the skin
    only changes WHEN buckets rebuild, never which pairs interact."""
    import jax

    from cavmd_tpu.core import PhysicalConstants as PC
    from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
    from cavmd_tpu.integrate import (
        ForceField, MethodSpec, init_state, make_step_fn, resolve_methods,
        run_steps,
    )

    snap = make_diatomic_system(40, box_L=36.0, temperature_K=100.0, seed=11)
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=12
    )
    kT = PC.kT_from_kelvin(100.0)
    methods_spec = (
        MethodSpec(kind="bussi", group="molecular", kT=kT,
                   tau=PC.ps_to_atomic_units(5.0)),
        MethodSpec(kind="langevin", group="cavity", kT=kT,
                   gamma=PC.gamma_from_tau_ps(5.0)),
    )
    finals = []
    for skin in (0.0, 0.5):
        ff = ForceField.create(
            snap, coupling=1e-3, pair_mode="cell", r_cut=10.0,
            pppm_mesh=(8, 8, 8), cell_skin=skin,
        )
        methods = resolve_methods(snap, methods_spec, ff.l_typeid)
        step = make_step_fn(ff, methods)
        state = init_state(snap, ff, dt=PC.fs_to_atomic_units(0.5), seed=5)
        assert (state.cell_list is not None) == (skin > 0)
        final, _ = jax.jit(lambda s: run_steps(step, s, 60))(state)
        finals.append(np.asarray(final.position))
    np.testing.assert_allclose(finals[0], finals[1], rtol=1e-12, atol=1e-12)
