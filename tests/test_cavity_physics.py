"""Cavity-mode physics validation: oscillation frequency, finite-q
equilibrium, energy exchange through the coupling."""

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
from cavmd_tpu.observe import make_extra_obs


def test_uncoupled_photon_oscillates_at_omega_c():
    """With g=0 the photon is a free 3-D harmonic oscillator at omega_c:
    measure the oscillation frequency from the trajectory."""
    freq_cm1 = 2000.0
    omegac = PC.omega_from_cm1(freq_cm1)
    snap = make_diatomic_system(5, box_L=40.0, seed=3)
    snap = add_cavity_particle(
        snap, coupling=0.0, freq_cm1=freq_cm1, temperature_K=100.0, seed=4
    )
    # displace the photon and release (no molecular motion matters at g=0)
    pos = np.array(snap.position)
    pos[-1] = [1.0, 0.5, -0.8]
    snap = snap.replace(position=jnp.asarray(pos))
    ff = ForceField.create(
        snap, coupling=0.0, freq_cm1=freq_cm1,
        enable_coulomb=False, enable_lj=False, enable_bonds=False,
    )
    methods = resolve_methods(snap, (MethodSpec(kind="nve", group="all"),),
                              ff.l_typeid)
    step = jax.jit(make_step_fn(ff, methods))
    # ~25 steps per period
    period_au = 2 * np.pi / omegac
    dt = period_au / 64
    state = init_state(snap, ff, dt=dt, seed=0)
    n_steps = 64 * 16  # 16 periods

    extra = make_extra_obs(dipole=False)

    def step_with_q(s):
        new_s, obs = step(s)
        obs["q_photon"] = new_s.position[-1]
        return new_s, obs

    _, obs = run_steps(step_with_q, state, n_steps)
    q = np.asarray(obs["q_photon"])[:, 0]  # x component
    # measured frequency from FFT peak
    spec = np.abs(np.fft.rfft(q - q.mean()))
    freqs = np.fft.rfftfreq(n_steps, d=float(dt))
    f_peak = freqs[np.argmax(spec[1:]) + 1]
    omega_meas = 2 * np.pi * f_peak
    assert omega_meas == pytest.approx(omegac, rel=0.02)


def test_finite_q_equilibrium_force_balance():
    """In finite-q mode (zero thermal noise via coupling!=0 handled by
    seedless check): at the displaced equilibrium q* = -g d / K the photon
    force's xy components vanish."""
    snap = make_diatomic_system(20, box_L=26.0, seed=9)
    g = 2e-3
    freq = 2000.0
    omegac = PC.omega_from_cm1(freq)
    K = omegac**2

    from cavmd_tpu.ops import CavityParams, cavity_force
    from cavmd_tpu.core.box import unwrap_positions

    # compute the dipole, then place the photon at -g d / K manually
    unwrapped = np.asarray(
        unwrap_positions(snap.position, snap.image, snap.box_L)
    )
    d = np.asarray(snap.charge) @ unwrapped
    q_star = -g * d / K
    q_star[2] = 0.0

    snap = add_cavity_particle(
        snap, coupling=0.0, freq_cm1=freq, temperature_K=100.0, seed=10
    )  # coupling=0 -> placed at origin with no noise
    pos = np.array(snap.position)
    pos[-1] = q_star
    snap = snap.replace(position=jnp.asarray(pos))

    params = CavityParams.create(omegac, g)
    f, e = cavity_force(
        snap.position, snap.image, snap.box_L, snap.charge, snap.typeid,
        snap.type_index("L"), params,
    )
    photon_f = np.asarray(f)[-1]
    np.testing.assert_allclose(photon_f[:2], 0.0, atol=1e-12)


def test_coupling_exchanges_energy():
    """With strong coupling, energy flows between the cavity mode and the
    molecules (the cavity kinetic/potential energies fluctuate), while with
    g=0 the photon energy is exactly constant."""
    snap0 = make_diatomic_system(20, box_L=26.0, temperature_K=200.0, seed=13)

    def run(g):
        snap = add_cavity_particle(
            snap0, coupling=g, freq_cm1=2000.0, temperature_K=100.0, seed=14
        )
        pos = np.array(snap.position)
        pos[-1] = [0.5, -0.3, 0.0]
        snap = snap.replace(position=jnp.asarray(pos))
        ff = ForceField.create(
            snap, coupling=g, freq_cm1=2000.0, enable_coulomb=False,
        )
        methods = resolve_methods(
            snap, (MethodSpec(kind="nve", group="all"),), ff.l_typeid
        )
        step = jax.jit(make_step_fn(ff, methods))
        state = init_state(snap, ff, dt=PC.fs_to_atomic_units(0.25), seed=2)
        _, obs = run_steps(step, state, 2000)
        e_cav = np.asarray(obs["kinetic_cavity"] + obs["cavity_harmonic"])
        return e_cav

    e_free = run(0.0)
    e_coupled = run(5e-3)
    # free photon: oscillator energy constant to integrator error
    assert np.ptp(e_free) < 1e-6
    # coupled: energy genuinely exchanged
    assert np.ptp(e_coupled) > 100 * max(np.ptp(e_free), 1e-12)


@pytest.mark.slow
def test_vacuum_rabi_splitting():
    """The headline physics: a molecular vibration resonant with the cavity
    splits into two polaritons; the splitting matches the analytic
    Omega_R = g q_c / (sqrt(mu m_ph) omega) and closes at g=0."""
    import os
    import importlib.util

    spec_path = os.path.join(
        os.path.dirname(__file__), "..", "examples",
        "07_polariton_rabi_splitting.py",
    )
    spec = importlib.util.spec_from_file_location("rabi_demo", spec_path)
    rabi = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rabi)

    g, q_c = 1e-3, 0.35
    peaks0, omega, f_cm1 = rabi.photon_spectrum_peaks(0.0, n_periods=400)
    assert len(peaks0) == 1
    assert peaks0[0] == pytest.approx(f_cm1, rel=0.01)

    peaks, _, _ = rabi.photon_spectrum_peaks(g, n_periods=400)
    assert len(peaks) == 2, peaks
    mu = rabi.M_O / 2
    analytic = (g * q_c / (mu ** 0.5) / omega) * 219474.63
    measured = peaks[1] - peaks[0]
    assert measured == pytest.approx(analytic, rel=0.15)
    # peaks straddle the bare resonance
    assert peaks[0] < f_cm1 < peaks[1]
