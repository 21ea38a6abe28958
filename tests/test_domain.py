"""Domain-decomposed cell pipeline (parallel/domain.py): slab residency
under shard_map with halo exchange, validated against the unsharded runner
on the virtual 8-device CPU mesh.

The reference inherits MPI domain decomposition from HOOMD (its plugin
hooks: src/Thermostat.h:297-303; the decomposed neighbor list consumed at
examples/05_advanced_run.py:573); this is the TPU-native equivalent
(SURVEY.md §2.4 "halo exchange for cell-list forces at large N").
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavmd_tpu.core import PhysicalConstants as PC
from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
from cavmd_tpu.integrate import (
    ForceField,
    MethodSpec,
    init_state,
    make_step_fn,
    resolve_methods,
    run_steps,
)
from cavmd_tpu.parallel.domain import (
    _rebuild_one,
    make_domain_runner,
    plan_domain,
)


def _build(n_mol=550, box_L=65.0, dtype=np.float64, r_cut=8.0,
           pppm=(16, 16, 16), seed=0):
    snap = make_diatomic_system(
        n_mol, box_L=box_L, temperature_K=100.0, seed=seed, dtype=np.float64
    )
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0,
        seed=seed + 1,
    )
    if dtype is not np.float64:
        snap = snap.astype(dtype)
    ff = ForceField.create(
        snap, coupling=1e-3, freq_cm1=2000.0, r_cut=r_cut,
        pair_mode="cell", pppm_mesh=pppm,
    )
    kT = PC.kT_from_kelvin(100.0)
    methods = resolve_methods(
        snap,
        (
            MethodSpec(kind="bussi", group="molecular", kT=kT,
                       tau=PC.ps_to_atomic_units(5.0)),
            MethodSpec(kind="langevin", group="cavity", kT=kT,
                       gamma=PC.gamma_from_tau_ps(5.0)),
        ),
        ff.l_typeid,
    )
    state = init_state(snap, ff, dt=PC.fs_to_atomic_units(0.5), seed=7)
    return snap, ff, methods, state


@pytest.fixture(scope="module")
def system():
    return _build()


def test_rebuild_layout_invariants(system):
    """The rebuild must place every molecule exactly once, keep bonded
    partners co-resident, and pin the photon to the last slot."""
    snap, ff, methods, state = system
    plan = plan_domain(snap, ff, 4)
    data = jax.jit(
        lambda p: _rebuild_one(p, plan, snap.box_L, ff.bond_k_per,
                               ff.bond_r0_per, ff.pair_inert, state.charge)
    )(state.position)
    perm = np.asarray(data.perm)
    n0 = plan.n0
    real = perm[perm < n0]
    # every molecule atom + photon appears exactly once
    assert sorted(real.tolist()) == sorted(range(n0))
    assert not bool(data.slab_overflow)
    assert not bool(data.bucket_overflow)
    assert perm[plan.S * plan.Mrow - 1] == plan.photon_row
    # bonded partners co-resident and adjacent (strided (2m, 2m+1) rows)
    pm = perm.reshape(plan.S, plan.Mrow)[:, :2 * plan.nb_cap]
    pairs = pm.reshape(plan.S, plan.nb_cap, 2)
    realp = pairs[pairs[:, :, 0] < n0]
    assert np.all(realp[:, 1] == realp[:, 0] + 1)
    assert np.all(realp[:, 0] % 2 == 0)
    # every binned atom occupies exactly one bucket slot of its shard
    buckets = np.asarray(data.buckets)  # (S, C_ext, cap) local ids
    binned = np.asarray(data.binned).reshape(plan.S, plan.Mrow)
    for s in range(plan.S):
        own = buckets[s][buckets[s] < plan.Mrow]
        assert sorted(own.tolist()) == sorted(
            np.where(binned[s])[0].tolist()
        )


def test_domain_matches_unsharded_trajectory(system):
    """12 domain steps (3 rebuild chunks, 4 slabs) must match the
    unsharded runner to f64 roundoff — same pair set, same RNG draws."""
    snap, ff, methods, state = system
    step = make_step_fn(ff, methods)
    ref_final, ref_obs = jax.jit(lambda s: run_steps(step, s, 12))(state)

    plan = plan_domain(snap, ff, 4)
    run = make_domain_runner(ff, methods, plan, rebuild_every=5)
    final, obs = run(state, 12)
    np.testing.assert_allclose(
        np.asarray(final.position), np.asarray(ref_final.position),
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(final.velocity), np.asarray(ref_final.velocity),
        rtol=1e-9, atol=1e-12,
    )
    for k in ref_obs:
        np.testing.assert_allclose(
            np.asarray(obs[k]), np.asarray(ref_obs[k]),
            rtol=1e-9, atol=1e-12, err_msg=f"obs[{k}]",
        )
    assert not np.asarray(obs["cell_overflow"]).any()


def test_domain_default_cadence_matches_unsharded(system):
    """25 steps at the DEFAULT rebuild cadence (20 — one full chunk plus
    a 5-step tail) must match the unsharded runner to f64 roundoff and
    trip neither the coverage invariant nor capacity overflow: the
    production default's safety margin is a tested property, not just
    the bench's (simulation.DOMAIN_REBUILD_EVERY and the runner default
    are measured/justified in docs/performance.md 'Rebuild cadence')."""
    from cavmd_tpu.simulation import DOMAIN_REBUILD_EVERY

    snap, ff, methods, state = system
    step = make_step_fn(ff, methods)
    ref_final, _ = jax.jit(lambda s: run_steps(step, s, 25))(state)

    plan = plan_domain(snap, ff, 4)
    run = make_domain_runner(ff, methods, plan)  # default cadence
    assert DOMAIN_REBUILD_EVERY == 20
    final, obs = run(state, 25)
    np.testing.assert_allclose(
        np.asarray(final.position), np.asarray(ref_final.position),
        rtol=1e-10, atol=1e-12,
    )
    assert not np.asarray(obs["cell_overflow"]).any()
    assert not np.asarray(obs["domain_capacity_overflow"]).any()


def test_domain_pallas_kernel_per_shard():
    """The Pallas cell tile kernel runs inside shard_map (interpret mode
    off-TPU) and reproduces the XLA tile domain path — the configuration
    GSPMD cannot express (it cannot partition a pallas_call)."""
    snap, ff, methods, state = _build(dtype=jnp.float32)
    plan = plan_domain(snap, ff, 4)
    run_xla = make_domain_runner(ff, methods, plan, rebuild_every=3)
    fin_x, obs_x = run_xla(state, 4)
    # prewrap=True covers the opt-in pre-wrapped slab layout (virtual
    # halo cell centers + whole-box shift tensors, wrap=False in-kernel;
    # measured neutral on TPU so not the default — see make_domain_step)
    run_pl = make_domain_runner(ff, methods, plan, rebuild_every=3,
                                interpret=True, prewrap=True)
    fin_p, obs_p = run_pl(state, 4)
    np.testing.assert_allclose(
        np.asarray(fin_p.position), np.asarray(fin_x.position),
        rtol=2e-6, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(obs_p["lj"]), np.asarray(obs_x["lj"]),
        rtol=1e-5, atol=1e-7,
    )


def test_domain_overflow_flag_and_recovery(system):
    """A too-small bucket capacity must flag cell_overflow (never drop
    pairs silently), and growing the plan must clear it — the re-plan +
    retry recovery the Simulation facade drives, now exercised while
    sharded (SURVEY.md §5 failure detection)."""
    snap, ff, methods, state = system
    plan = plan_domain(snap, ff, 4)
    tiny = plan._replace(cap=2)
    run = make_domain_runner(ff, methods, tiny, rebuild_every=4)
    _, obs = run(state, 4)
    assert np.asarray(obs["cell_overflow"]).any()

    grown = tiny.grow_cap()
    while grown.cap < plan.cap:
        grown = grown.grow_cap()
    run2 = make_domain_runner(ff, methods, grown, rebuild_every=4)
    final2, obs2 = run2(state, 4)
    assert not np.asarray(obs2["cell_overflow"]).any()
    # recovered run matches the ordinary plan's trajectory
    run_ref = make_domain_runner(ff, methods, plan, rebuild_every=4)
    final_ref, _ = run_ref(state, 4)
    np.testing.assert_allclose(
        np.asarray(final2.position), np.asarray(final_ref.position),
        rtol=1e-10, atol=1e-12,
    )


def test_simulation_routes_shard_atoms_through_domain(system):
    """Simulation(shard_atoms=S) must pick the slab pipeline for cell-mode
    runs and reproduce the unsharded Simulation trajectory; the overflow
    retry must re-plan the DOMAIN capacities."""
    from cavmd_tpu.simulation import Simulation

    snap, ff, methods, _ = system
    dt = PC.fs_to_atomic_units(0.5)
    sim_ref = Simulation(snap, ff, methods, dt=dt, seed=3, chunk_size=6)
    sim_ref.thermalize(PC.kT_from_kelvin(100.0))
    sim_dom = Simulation(snap, ff, methods, dt=dt, seed=3, chunk_size=6,
                         shard_atoms=4)
    assert sim_dom._domain_plan is not None
    sim_dom.thermalize(PC.kT_from_kelvin(100.0))

    sim_ref.run(n_steps=12)
    sim_dom.run(n_steps=12)
    np.testing.assert_allclose(
        np.asarray(sim_dom.state.position), np.asarray(sim_ref.state.position),
        rtol=1e-10, atol=1e-12,
    )

    # overflow recovery while sharded: cripple the plan, run a chunk, and
    # expect the facade to re-plan + retry to the same final state
    sim_bad = Simulation(snap, ff, methods, dt=dt, seed=3, chunk_size=6,
                         shard_atoms=4)
    sim_bad.thermalize(PC.kT_from_kelvin(100.0))
    sim_bad._domain_plan = sim_bad._domain_plan._replace(cap=2)
    sim_bad._build_runner()
    sim_bad.run(n_steps=12)
    assert sim_bad._domain_plan.cap >= 4  # recovery grew the plan
    # ... WITHOUT touching the rebuild cadence: the runner reports
    # capacity overflow separately from the drift-coverage invariant, so
    # a one-time bucket overflow must not permanently tax every later
    # step with extra rebuilds (ADVICE r4 item 1)
    from cavmd_tpu.simulation import DOMAIN_REBUILD_EVERY

    assert sim_bad._domain_rebuild_every == DOMAIN_REBUILD_EVERY
    np.testing.assert_allclose(
        np.asarray(sim_bad.state.position), np.asarray(sim_ref.state.position),
        rtol=1e-10, atol=1e-12,
    )


def test_domain_adaptive_fkt_matches_unsharded(system):
    """The reference's PRODUCTION DEFAULT workflow — adaptive dt (on by
    default, error_tolerance=0 only under --fixed-timestep,
    05_advanced_run.py:1390-1398) with dipole + F(k,t) observables at
    trigger period 1 (analysis.py:260-418) — must run ON the domain
    pipeline and match the unsharded adaptive runner to f64 roundoff
    (VERDICT r4 item 1)."""
    from cavmd_tpu.integrate.adaptive import make_adaptive_step
    from cavmd_tpu.observe import generate_fibonacci_sphere, make_extra_obs

    snap, ff, methods, state = system
    wv = generate_fibonacci_sphere(12) * 1.2
    extra = make_extra_obs(dipole=True, wavevectors=wv)
    adaptive = dict(error_tolerance=5e-6, initial_fraction=1e-3,
                    time_constant_ps=50.0, period=2)

    step = make_adaptive_step(
        make_step_fn(ff, methods, extra_obs=extra), **adaptive
    )
    state = state.replace(error_tolerance=jnp.asarray(5e-9, jnp.float64))
    ref_final, ref_obs = jax.jit(lambda s: run_steps(step, s, 12))(state)

    plan = plan_domain(snap, ff, 4)
    run = make_domain_runner(ff, methods, plan, rebuild_every=5,
                             adaptive=adaptive, obs_spec=(True, wv))
    final, obs = run(state, 12)
    np.testing.assert_allclose(
        np.asarray(final.position), np.asarray(ref_final.position),
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(final.dt), np.asarray(ref_final.dt), rtol=1e-12,
    )
    for k in ref_obs:  # incl. dipole, rho_k_re/im, error_tolerance, dt
        np.testing.assert_allclose(
            np.asarray(obs[k]), np.asarray(ref_obs[k]),
            rtol=1e-8, atol=1e-12, err_msg=f"obs[{k}]",
        )
    # adaptive actually moved dt (the controller really ran)
    assert abs(float(final.dt) - float(state.dt)) > 1e-6 * float(state.dt)


def test_simulation_domain_gate_accepts_production_default(system):
    """Simulation(shard_atoms=S) with adaptive dt + make_extra_obs — the
    driver's default config — must pick the domain pipeline (no silent
    GSPMD fallback) and reproduce the unsharded Simulation trajectory."""
    from cavmd_tpu.observe import generate_fibonacci_sphere, make_extra_obs
    from cavmd_tpu.simulation import Simulation

    snap, ff, methods, _ = system
    wv = generate_fibonacci_sphere(8) * 1.0
    kw = dict(dt=PC.fs_to_atomic_units(0.25), seed=3, chunk_size=6,
              error_tolerance=5e-6, adaptive_period=2,
              extra_obs=make_extra_obs(dipole=True, wavevectors=wv))
    sim_ref = Simulation(snap, ff, methods, **kw)
    sim_ref.thermalize(PC.kT_from_kelvin(100.0))
    sim_dom = Simulation(snap, ff, methods, shard_atoms=4, **kw)
    assert sim_dom._domain_plan is not None  # the r4 gate is gone
    sim_dom.thermalize(PC.kT_from_kelvin(100.0))

    class Capture:
        def __init__(self):
            self.obs = []

        def consume(self, obs):
            self.obs.append(obs)

    cap_ref, cap_dom = Capture(), Capture()
    sim_ref.trackers.append(cap_ref)
    sim_dom.trackers.append(cap_dom)
    sim_ref.run(n_steps=12)
    sim_dom.run(n_steps=12)
    np.testing.assert_allclose(
        np.asarray(sim_dom.state.position),
        np.asarray(sim_ref.state.position), rtol=1e-10, atol=1e-12,
    )
    for k in ("dipole", "rho_k_re", "rho_k_im", "error_tolerance", "dt"):
        ref = np.concatenate([np.asarray(o[k]) for o in cap_ref.obs])
        dom = np.concatenate([np.asarray(o[k]) for o in cap_dom.obs])
        np.testing.assert_allclose(dom, ref, rtol=1e-8, atol=1e-12,
                                   err_msg=f"obs[{k}]")


def test_domain_replicas_x_slabs(system):
    """The reference's TWO scale-out axes composed on ONE mesh — SLURM
    array replicas (submit.sh:4, --array=0-499) over MPI-decomposed ranks
    (05_advanced_run.py:573) — as a 2x4 ('replica','atoms') shard_map:
    each replica must match ITS OWN unsharded trajectory to f64 roundoff,
    with adaptive dt + dipole/rho(k) observables running inside the
    sharded step (VERDICT r4 item 4)."""
    from cavmd_tpu.integrate.adaptive import make_adaptive_step
    from cavmd_tpu.observe import generate_fibonacci_sphere, make_extra_obs
    from cavmd_tpu.parallel import make_mesh
    from cavmd_tpu.parallel.replicas import (
        init_replica_states,
        make_replica_step,
    )

    snap, ff, methods, _ = system
    wv = generate_fibonacci_sphere(8) * 1.0
    extra = make_extra_obs(dipole=True, wavevectors=wv)
    adaptive = dict(error_tolerance=5e-6, initial_fraction=1e-3,
                    time_constant_ps=50.0, period=2)
    kT = PC.kT_from_kelvin(100.0)
    batched = init_replica_states(
        snap, ff, n_replicas=2, dt=PC.fs_to_atomic_units(0.5), seed=11,
        kT=kT, error_tolerance=5e-9,
    )

    astep = make_adaptive_step(
        make_step_fn(ff, methods, extra_obs=extra), **adaptive
    )
    ref_final, ref_obs = jax.jit(
        lambda s: run_steps(make_replica_step(astep), s, 12)
    )(batched)

    plan = plan_domain(snap, ff, 4)
    mesh = make_mesh(n_replica=2, n_atoms_shards=4)
    run = make_domain_runner(ff, methods, plan, mesh, rebuild_every=5,
                             adaptive=adaptive, obs_spec=(True, wv),
                             n_replicas=2)
    final, obs = run(batched, 12)
    # replicas genuinely decorrelated (different thermal seeds)
    assert not np.allclose(np.asarray(ref_final.position[0]),
                           np.asarray(ref_final.position[1]))
    np.testing.assert_allclose(
        np.asarray(final.position), np.asarray(ref_final.position),
        rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(final.dt), np.asarray(ref_final.dt), rtol=1e-12,
    )
    for k in ref_obs:  # (steps, R, ...) layout on both sides
        np.testing.assert_allclose(
            np.asarray(obs[k]), np.asarray(ref_obs[k]),
            rtol=1e-8, atol=1e-12, err_msg=f"obs[{k}]",
        )


@pytest.mark.skipif(
    not os.environ.get("CAVMD_SLOW_TESTS"),
    reason="~8 min on CPU; run with CAVMD_SLOW_TESTS=1 (the N=5,001 "
           "version runs in every dryrun_multichip)",
)
def test_domain_production_scale_20k():
    """N=20,001 over all 8 virtual devices: buckets, rebuild triggers,
    slab migration, and ghost fillers interacting at a size where the
    cell list is genuinely the right structure (VERDICT r3 item 8).
    Includes a mid-run rebuild (2 chunks) and the overflow channel."""
    from cavmd_tpu.core.system import reference_box_for

    snap = make_diatomic_system(
        10_000, box_L=reference_box_for(10_000), temperature_K=100.0,
        seed=0, dtype=np.float64,
    )
    snap = add_cavity_particle(snap, coupling=1e-3, freq_cm1=2000.0,
                               temperature_K=100.0, seed=1)
    ff = ForceField.create(snap, coupling=1e-3, freq_cm1=2000.0,
                           pair_mode="cell", r_cut=8.0,
                           pppm_mesh=(16, 16, 16))
    kT = PC.kT_from_kelvin(100.0)
    methods = resolve_methods(
        snap,
        (
            MethodSpec(kind="bussi", group="molecular", kT=kT,
                       tau=PC.ps_to_atomic_units(5.0)),
            MethodSpec(kind="langevin", group="cavity", kT=kT,
                       gamma=PC.gamma_from_tau_ps(5.0)),
        ),
        ff.l_typeid,
    )
    state = init_state(snap, ff, dt=PC.fs_to_atomic_units(0.5), seed=7)
    step = make_step_fn(ff, methods)
    ref_final, _ = jax.jit(lambda s: run_steps(step, s, 8))(state)

    plan = plan_domain(snap, ff, 8)
    run = make_domain_runner(ff, methods, plan, rebuild_every=4)
    final, obs = run(state, 8)
    np.testing.assert_allclose(
        np.asarray(final.position), np.asarray(ref_final.position),
        rtol=1e-10, atol=1e-10,
    )
    assert not np.asarray(obs["cell_overflow"]).any()


def test_plan_rejections():
    """Unsupported configurations must raise (the Simulation facade falls
    back to GSPMD sharding on ValueError)."""
    snap = make_diatomic_system(40, box_L=25.0, temperature_K=100.0, seed=0,
                                dtype=np.float64)
    snap = add_cavity_particle(snap, coupling=1e-3, freq_cm1=2000.0,
                               temperature_K=100.0, seed=1)
    ff_dense = ForceField.create(snap, coupling=1e-3, r_cut=10.0,
                                 pppm_mesh=(16, 16, 16))
    with pytest.raises(ValueError, match="pair_mode"):
        plan_domain(snap, ff_dense, 2)
    ff_cell = ForceField.create(snap, coupling=1e-3, r_cut=10.0,
                                pair_mode="cell", pppm_mesh=(16, 16, 16))
    with pytest.raises(ValueError, match="box too small"):
        plan_domain(snap, ff_cell, 8)


def test_plan_nb_cap_clamped_at_n_mol(system):
    """Slab capacity can never usefully exceed the total molecule count —
    at S=1 the clamp removes ~13% filler rows from every per-row op
    (and grow_cap must respect it too)."""
    snap, ff, _, _ = system
    plan = plan_domain(snap, ff, 1)
    assert plan.nb_cap == plan.n_mol
    grown = plan.grow_cap()
    assert grown.nb_cap == plan.n_mol
    assert grown.cap > plan.cap
