"""Integrator + thermostat physics tests.

Primary oracles (SURVEY.md §4):
- NVE total-energy conservation (discretization-limited drift);
- universe energy (system + reservoirs) conservation under thermostats —
  the reference's conserved quantity (analysis.py:954-958);
- Bussi rescale-factor distribution moments (analytic);
- counter-based RNG determinism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cavmd_tpu.core import PhysicalConstants, add_cavity_particle, make_diatomic_system
from cavmd_tpu.integrate import (
    ForceField,
    MethodSpec,
    bussi_rescale_factor,
    init_state,
    make_adaptive_step,
    make_step_fn,
    master_key,
    potential_energy,
    resolve_methods,
    run_steps,
    thermalize_velocities,
    universe_energy,
)


def build_system(n_mol=20, coupling=1e-3, box_L=24.0, enable_coulomb=True, seed=0):
    snap = make_diatomic_system(n_mol, box_L=box_L, temperature_K=100.0, seed=seed)
    snap = add_cavity_particle(
        snap, coupling=coupling, freq_cm1=2000.0, temperature_K=100.0, seed=seed + 1
    )
    # photon thermal velocity (reference 05_advanced_run.py:722-743)
    kT = PhysicalConstants.kT_from_kelvin(100.0)
    v = np.array(snap.velocity)
    rng = np.random.default_rng(seed + 2)
    v[-1] = rng.normal(0.0, np.sqrt(kT), size=3)
    snap = snap.replace(velocity=jnp.asarray(v))
    ff = ForceField.create(
        snap, coupling=coupling, freq_cm1=2000.0,
        pppm_mesh=(16, 16, 16), r_cut=10.0, enable_coulomb=enable_coulomb,
    )
    return snap, ff


def test_nve_energy_conservation():
    """NVE drift is bounded and second-order in dt (velocity Verlet)."""
    snap, ff = build_system()
    methods = resolve_methods(
        snap, (MethodSpec(kind="nve", group="all"),), ff.l_typeid
    )
    step = jax.jit(make_step_fn(ff, methods))

    _, e0 = ff.compute(
        snap.position, snap.image, snap.box_L, snap.charge, snap.typeid,
        snap.bond_group, snap.bond_typeid,
    )
    from cavmd_tpu.integrate.thermostats import kinetic_energy

    ke0 = kinetic_energy(snap.velocity, snap.mass, jnp.ones(snap.N, bool))
    E0 = float(potential_energy(e0) + ke0)

    def max_err(dt_fs, n):
        dt = PhysicalConstants.fs_to_atomic_units(dt_fs)
        state = init_state(snap, ff, dt=dt, seed=1)
        _, obs = run_steps(step, state, n)
        E = np.asarray(
            potential_energy(obs) + obs["kinetic_molecular"] + obs["kinetic_cavity"]
        )
        return np.abs(E - E0).max()

    # same physical time (50 fs) at two resolutions: error ~ dt^2
    err_coarse = max_err(0.25, 200)
    err_fine = max_err(0.125, 400)
    assert err_coarse < 2e-4, f"NVE energy error too large: {err_coarse}"
    ratio = err_coarse / err_fine
    assert 2.5 < ratio < 6.0, f"not second order: ratio {ratio}"


def test_universe_energy_conservation_bussi_langevin():
    """The flagship oracle: Bussi molecular + Langevin cavity, universe
    energy (system + reservoirs) conserved to discretization error."""
    snap, ff = build_system()
    kT = PhysicalConstants.kT_from_kelvin(100.0)
    tau = PhysicalConstants.ps_to_atomic_units(5.0)
    gamma = PhysicalConstants.gamma_from_tau_ps(5.0)
    methods = resolve_methods(
        snap,
        (
            MethodSpec(kind="bussi", group="molecular", kT=kT, tau=tau),
            MethodSpec(kind="langevin", group="cavity", kT=kT, gamma=gamma),
        ),
        ff.l_typeid,
    )
    step = jax.jit(make_step_fn(ff, methods))
    dt = PhysicalConstants.fs_to_atomic_units(0.25)
    state = init_state(snap, ff, dt=dt, seed=3)

    final, obs = run_steps(step, state, 1000)
    U = np.asarray(universe_energy(obs))
    drift = np.abs(U - U[0]).max()
    # reservoirs must actually be exchanging energy for this to be a real test
    assert abs(float(final.bussi_reservoir[0])) > 1e-8
    assert abs(float(final.langevin_reservoir[1])) > 1e-10
    # bounded by the velocity-Verlet discretization floor (same magnitude as
    # the NVE energy oscillation for this dt); reference drifts 5.5e-3 Ha
    # over 50 ps (BASELINE.md) — this is 0.25 ps
    assert drift < 2e-4, f"universe drift {drift}"


def test_rbg_rng_impl_runs_and_checkpoints():
    """``rng_impl="rbg"`` (the measured-faster TPU PRNG, opt-in via the
    driver's ``--rng-impl``): the thermostat streams run, universe energy
    stays conserved, and the typed-key state survives a .npz checkpoint
    round-trip bit-exactly (io/checkpoint.py key_data handling)."""
    import tempfile
    from pathlib import Path

    from cavmd_tpu.io import load_checkpoint, save_checkpoint

    snap, ff = build_system(n_mol=8, box_L=20.0, enable_coulomb=False)
    kT = PhysicalConstants.kT_from_kelvin(100.0)
    methods = resolve_methods(
        snap,
        (
            MethodSpec(kind="bussi", group="molecular", kT=kT,
                       tau=PhysicalConstants.ps_to_atomic_units(5.0)),
            MethodSpec(kind="langevin", group="cavity", kT=kT,
                       gamma=PhysicalConstants.gamma_from_tau_ps(5.0)),
        ),
        ff.l_typeid,
    )
    step = jax.jit(make_step_fn(ff, methods))
    dt = PhysicalConstants.fs_to_atomic_units(0.25)
    state = init_state(snap, ff, dt=dt, seed=3, rng_impl="rbg")
    assert jax.dtypes.issubdtype(state.key.dtype, jax.dtypes.prng_key)

    mid, obs = run_steps(step, state, 300)
    U = np.asarray(universe_energy(obs))
    assert np.abs(U - U[0]).max() < 2e-4
    # the rbg stream must actually differ from threefry (same seed)
    t_state = init_state(snap, ff, dt=dt, seed=3)
    t_mid, _ = run_steps(step, t_state, 300)
    assert not np.allclose(np.asarray(mid.velocity),
                           np.asarray(t_mid.velocity))

    with tempfile.TemporaryDirectory() as d:
        path = str(Path(d) / "ckpt.npz")
        save_checkpoint(path, mid)
        live, _ = run_steps(step, mid, 100)
        resumed = load_checkpoint(path, mid)
        np.testing.assert_array_equal(
            jax.random.key_data(resumed.key), jax.random.key_data(mid.key)
        )
        replay, _ = run_steps(step, resumed, 100)
        np.testing.assert_array_equal(
            np.asarray(replay.position), np.asarray(live.position)
        )


def test_universe_conservation_langevin_molecular():
    snap, ff = build_system(n_mol=10, box_L=20.0, enable_coulomb=False)
    kT = PhysicalConstants.kT_from_kelvin(100.0)
    gamma = PhysicalConstants.gamma_from_tau_ps(1.0)
    methods = resolve_methods(
        snap,
        (
            MethodSpec(kind="langevin", group="molecular", kT=kT, gamma=gamma),
            MethodSpec(kind="langevin", group="cavity", kT=kT, gamma=gamma),
        ),
        ff.l_typeid,
    )
    step = jax.jit(make_step_fn(ff, methods))
    state = init_state(snap, ff, dt=PhysicalConstants.fs_to_atomic_units(0.25), seed=5)
    final, obs = run_steps(step, state, 500)
    U = np.asarray(universe_energy(obs))
    assert np.abs(U - U[0]).max() < 5e-5


def test_bussi_factor_distribution():
    """alpha^2 moments: for dt<<tau, E[alpha^2] ~ 1 + (dt/tau)(T0/T - 1).
    With T = T0 exactly, E[alpha^2] = 1 and Var grows like 2 dt kT^2.../
    use the exact invariant: if KE is at equilibrium (KE = Nf kT/2),
    E[alpha^2] = c + (1-c) * (E[r_gamma] + 1) * kT/(2 KE) = 1."""
    dof = 300.0
    kT = 3.167e-4
    K = dof * kT / 2.0  # equilibrium KE
    dt, tau = 1.0, 100.0
    keys = jax.random.split(master_key(0), 4000)
    alphas = jax.vmap(
        lambda k: bussi_rescale_factor(jnp.asarray(K), dof, dt, tau, kT, k)
    )(keys)
    a2 = np.asarray(alphas) ** 2
    c = np.exp(-dt / tau)
    # E[alpha^2] = c + (1-c)/ (2K/kT) * (dof-1 + 1) + 0 = c + (1-c) = 1
    assert a2.mean() == pytest.approx(1.0, abs=3e-3)
    # variance: Var = (1-c)^2 Var[x]/(2K/kT)^2 + 2c(1-c)/(2K/kT), x~chi2_dof
    q = 2.0 * K / kT
    var = (1 - c) ** 2 * 2 * dof / q**2 + 4 * c * (1 - c) / q
    assert a2.var() == pytest.approx(var, rel=0.15)


def test_bussi_sign_correction_limit():
    """tau -> 0 (c = 0): alpha^2 = v*(r_gamma + r1^2) is a fresh KE draw;
    the A8 sign is sign(r1), so ~half the factors should be negative."""
    dof = 10.0
    kT = 1.0
    K = dof * kT / 2.0
    keys = jax.random.split(master_key(1), 2000)
    alphas = np.asarray(
        jax.vmap(
            lambda k: bussi_rescale_factor(jnp.asarray(K), dof, 1.0, 0.0, kT, k)
        )(keys)
    )
    neg_frac = (alphas < 0).mean()
    assert 0.4 < neg_frac < 0.6
    # without the sign correction all factors are positive (HOOMD behavior)
    alphas_nosign = np.asarray(
        jax.vmap(
            lambda k: bussi_rescale_factor(
                jnp.asarray(K), dof, 1.0, 0.0, kT, k, sign_correction=False
            )
        )(keys)
    )
    assert (alphas_nosign > 0).all()


def test_determinism_counter_rng():
    """Same seed -> bit-identical trajectory; different seed -> different."""
    snap, ff = build_system(n_mol=5, box_L=18.0, enable_coulomb=False)
    kT = PhysicalConstants.kT_from_kelvin(100.0)
    methods = resolve_methods(
        snap,
        (
            MethodSpec(kind="bussi", group="molecular", kT=kT, tau=100.0),
            MethodSpec(kind="langevin", group="cavity", kT=kT, gamma=1e-3),
        ),
        ff.l_typeid,
    )
    step = jax.jit(make_step_fn(ff, methods))
    dt = PhysicalConstants.fs_to_atomic_units(0.5)
    s1, _ = run_steps(step, init_state(snap, ff, dt=dt, seed=42), 50)
    s2, _ = run_steps(step, init_state(snap, ff, dt=dt, seed=42), 50)
    s3, _ = run_steps(step, init_state(snap, ff, dt=dt, seed=43), 50)
    np.testing.assert_array_equal(np.asarray(s1.position), np.asarray(s2.position))
    assert not np.allclose(np.asarray(s1.position), np.asarray(s3.position))


def test_langevin_thermalizes_to_target():
    """Strong-friction Langevin drives the system to kT (canonical KE)."""
    snap, ff = build_system(n_mol=15, box_L=22.0, enable_coulomb=False, seed=9)
    kT = PhysicalConstants.kT_from_kelvin(200.0)
    gamma = PhysicalConstants.gamma_from_tau_ps(0.05)
    methods = resolve_methods(
        snap, (MethodSpec(kind="langevin", group="all", kT=kT, gamma=gamma),),
        ff.l_typeid,
    )
    step = jax.jit(make_step_fn(ff, methods))
    state = init_state(snap, ff, dt=PhysicalConstants.fs_to_atomic_units(0.5), seed=7)
    final, obs = run_steps(step, state, 3000)
    ke = np.asarray(obs["kinetic_molecular"] + obs["kinetic_cavity"])[1500:]
    dof = 3 * snap.N
    T_measured = 2 * ke.mean() / (dof * PhysicalConstants.KB_HARTREE_PER_K)
    assert T_measured == pytest.approx(200.0, rel=0.1)


def test_bussi_equilibrium_mean_temperature():
    """The Bussi bath must hold the EQUILIBRIUM mean kinetic temperature at
    the target — the suite-level tripwire for thermostat/DOF bias
    (VERDICT r4 item 2: the bench artifact's early mean-T anomaly was
    diagnosed as lattice under-equilibration, ~12 ps structural
    relaxation; this test pins the other hypothesis — a biased formula —
    to <~2.5% forever). Short tau (0.2 ps) decorrelates fast, so 10 ps of
    burn-in + 15 ps of measurement give ~75 independent KE samples:
    SEM(T) ~ 1.7%, assert 6% (~3.5 sigma)."""
    snap, ff = build_system(n_mol=15, box_L=22.0, enable_coulomb=False,
                            seed=31)
    kT = PhysicalConstants.kT_from_kelvin(100.0)
    tau = PhysicalConstants.ps_to_atomic_units(0.2)
    methods = resolve_methods(
        snap,
        (
            MethodSpec(kind="bussi", group="molecular", kT=kT, tau=tau),
            MethodSpec(kind="langevin", group="cavity", kT=kT,
                       gamma=PhysicalConstants.gamma_from_tau_ps(0.2)),
        ),
        ff.l_typeid,
    )
    step = jax.jit(make_step_fn(ff, methods))
    state = init_state(
        snap, ff, dt=PhysicalConstants.fs_to_atomic_units(0.5), seed=13
    )
    n_burn, n_meas = 20_000, 30_000
    state, _ = run_steps(step, state, n_burn)
    _, obs = run_steps(step, state, n_meas)
    dof = next(m.dof for m in methods if m.group == "molecular")
    ke = np.asarray(obs["kinetic_molecular"], np.float64)
    T = 2.0 * ke.mean() / (dof * PhysicalConstants.KB_HARTREE_PER_K)
    assert T == pytest.approx(100.0, rel=0.06), f"mean T = {T:.2f} K"


def test_adaptive_dt_ramp():
    snap, ff = build_system(n_mol=10, box_L=20.0, enable_coulomb=False)
    methods = resolve_methods(
        snap, (MethodSpec(kind="nve", group="all"),), ff.l_typeid
    )
    base = make_step_fn(ff, methods)
    step = jax.jit(
        make_adaptive_step(base, error_tolerance=0.01, initial_fraction=1e-3)
    )
    state = init_state(snap, ff, dt=1e-3, seed=1, error_tolerance=0.01)
    final, obs = run_steps(step, state, 100)
    dts = np.asarray(obs["dt"])
    # dt is set from forces, not the initial guess
    from cavmd_tpu.integrate import compute_optimal_dt

    expected0 = float(
        compute_optimal_dt(state.forces, state.mass, 0.01 * 1e-3)
    )
    assert dts[0] == pytest.approx(expected0, rel=1e-6)
    # tolerance ramps upward -> dt grows over time (forces roughly stable)
    assert np.asarray(obs["dt"])[-1] > 0

    # thermalized photon untouched: check error tolerance monotone
    # (ramping from tol0 toward target)
    tols = np.asarray(final.error_tolerance)
    assert tols > 0.01 * 1e-3 * 0.99


def test_mttk_and_berendsen_run():
    """MTTK and Berendsen methods execute and keep temperature near target."""
    snap, ff = build_system(n_mol=10, box_L=20.0, enable_coulomb=False, seed=21)
    kT = PhysicalConstants.kT_from_kelvin(100.0)
    for kind in ("mttk", "berendsen"):
        methods = resolve_methods(
            snap,
            (
                MethodSpec(kind=kind, group="molecular", kT=kT,
                           tau=PhysicalConstants.ps_to_atomic_units(0.5)),
                MethodSpec(kind="nve", group="cavity"),
            ),
            ff.l_typeid,
        )
        step = jax.jit(make_step_fn(ff, methods))
        state = init_state(snap, ff, dt=PhysicalConstants.fs_to_atomic_units(0.5), seed=2)
        final, obs = run_steps(step, state, 500)
        ke = np.asarray(obs["kinetic_molecular"])[-200:]
        T = 2 * ke.mean() / (3 * (snap.N - 1) * PhysicalConstants.KB_HARTREE_PER_K)
        assert 30.0 < T < 300.0, f"{kind}: T={T}"


def test_brownian_canonical_sampling():
    """Brownian (overdamped) dynamics samples the canonical position
    distribution: Var(x) = kT/k in a harmonic trap (the method the
    reference's own gamma*dt guidance points overdamped users to,
    src/cavitymd/utils.py:59-64), and velocities carry Maxwell samples."""
    from cavmd_tpu.core.snapshot import Snapshot

    N = 64
    rng = np.random.default_rng(0)
    snap = Snapshot.create(
        position=rng.normal(size=(N, 3)) * 0.5,
        box_L=np.array([200.0, 200.0, 200.0]),
        velocity=np.zeros((N, 3)), image=np.zeros((N, 3), np.int32),
        mass=np.ones(N), charge=np.zeros(N), diameter=np.ones(N),
        typeid=np.zeros(N, np.int32), types=("O",),
    )
    k_trap = 0.2

    def trap(position, image, box_L, charge, typeid):
        return -k_trap * position, 0.5 * k_trap * jnp.sum(position**2)

    ff = ForceField.create(
        snap, enable_cavity=False, enable_coulomb=False, enable_lj=False,
        enable_bonds=False, lj_params={("O", "O"): dict(epsilon=0.0, sigma=1.0)},
        pppm_mesh=(8, 8, 8), custom_forces=(trap,),
    )
    kT = PhysicalConstants.kT_from_kelvin(100.0)
    gamma, dt = 0.5, 0.05  # position relax time m*gamma/k = 2.5 au = 50 steps
    methods = resolve_methods(
        snap, (MethodSpec(kind="brownian", group="all", kT=kT, gamma=gamma),),
        ff.l_typeid,
    )
    step = make_step_fn(ff, methods)
    state = init_state(snap, ff, dt=dt, seed=3)
    runner = jax.jit(lambda s, n: run_steps(step, s, n), static_argnums=1)
    state, _ = runner(state, 2000)  # burn-in: 40 position relax times
    pos_samples, vel_samples = [], []
    for _ in range(200):
        state, _ = runner(state, 50)  # one relax time between samples
        pos_samples.append(np.asarray(state.position))
        vel_samples.append(np.asarray(state.velocity))
    var_x = np.stack(pos_samples).var()
    var_v = np.stack(vel_samples).var()
    # Euler-Maruyama stationary variance bias is 1/(1 - theta/2), theta =
    # k dt/(m gamma) = 0.02 here -> ~+1%; allow 5% total with sampling noise
    assert var_x == pytest.approx(kT / k_trap, rel=0.05)
    assert var_v == pytest.approx(kT, rel=0.05)  # Maxwell resampling, m=1


def test_run_steps_mixed_dtype_obs_packing():
    """``run_steps``' obs packing (static eval_shape plan, VERDICT r3
    item 7) must round-trip a mixed-dtype obs pytree exactly: f32/f64/i32
    scalars (packed per dtype group), (B,)-shaped rows, and singleton
    leaves, with values identical to an unpacked per-step loop."""
    from cavmd_tpu.integrate.integrator import run_steps

    def step_fn(x):
        x = x + 1.0
        obs = {
            "a_f32": jnp.float32(x) * 2.0,
            "b_f32": jnp.float32(x) + 0.5,
            "c_f64": jnp.float64(x) * 3.0,
            "d_f64": jnp.float64(x) - 1.0,
            "e_i32": jnp.int32(x),
            "f_i32": jnp.int32(x) * 7,
            "lone_bool": x > 2.5,
            "row_f32": jnp.full((4,), x, jnp.float32),
            "row2_f32": jnp.full((4,), x * x, jnp.float32),
        }
        return x, obs

    x0 = jnp.float64(0.0)
    final, obs = jax.jit(lambda s: run_steps(step_fn, s, 6))(x0)
    assert float(final) == 6.0
    # reference: plain python loop over the same step
    x, ref = x0, []
    for _ in range(6):
        x, o = step_fn(x)
        ref.append(o)
    for k in ref[0]:
        got = np.asarray(obs[k])
        want = np.stack([np.asarray(o[k]) for o in ref])
        assert got.dtype == want.dtype, k
        np.testing.assert_array_equal(got, want, err_msg=k)
