"""Spectra post-processing: analytic oracles + tracker-file round trip."""

import numpy as np
import pytest

from cavmd_tpu.observe import (
    DipoleAutocorrelation,
    FieldAutocorrelationTracker,
    ir_absorption,
    peak_frequencies,
    read_autocorr_file,
    read_autocorr_segments,
    read_fkt_references,
    spectrum_from_acf,
    spectrum_from_signal,
)

C_CM_PER_PS = 0.0299792458


def _damped_cosine_acf(nu_cm1, tau_ps, dt_ps, n):
    """C(t) = exp(-t/tau) cos(2 pi c nu t): Lorentzian line at nu."""
    t = np.arange(n) * dt_ps
    omega = 2 * np.pi * C_CM_PER_PS * nu_cm1  # rad/ps
    return t, np.exp(-t / tau_ps) * np.cos(omega * t)


def test_acf_spectrum_peaks_at_line_frequency():
    nu0 = 1600.0  # cm^-1, a vibrational line
    dt = 0.005  # ps sample spacing
    t, c = _damped_cosine_acf(nu0, tau_ps=2.0, dt_ps=dt, n=4000)
    freq, spec = spectrum_from_acf(t, c)
    peak = freq[np.argmax(spec)]
    # zero-padded resolution ~ 1/(4*T*c) ~ 0.4 cm^-1; window bias ~ a bin
    assert peak == pytest.approx(nu0, abs=2.0)


def test_ir_absorption_suppresses_zero_frequency():
    """A static dipole offset (C(t) -> const) must not produce a w=0
    line in the absorption spectrum — the w^2 prefactor kills it."""
    nu0 = 800.0
    dt = 0.005
    t, c = _damped_cosine_acf(nu0, tau_ps=1.5, dt_ps=dt, n=3000)
    c = c + 5.0  # un-subtracted static dipole contribution
    freq, absb = ir_absorption(t, c)
    assert absb[0] == 0.0
    peaks = peak_frequencies(freq, absb, threshold=0.5)
    assert len(peaks) == 1 and peaks[0] == pytest.approx(nu0, abs=2.0)


def test_two_line_acf_resolves_both():
    dt = 0.005
    t, c1 = _damped_cosine_acf(1510.0, 3.0, dt, 6000)
    _, c2 = _damped_cosine_acf(1602.0, 3.0, dt, 6000)
    freq, spec = spectrum_from_acf(t, c1 + c2)
    peaks = peak_frequencies(freq, spec, threshold=0.4)
    assert len(peaks) == 2
    assert peaks[0] == pytest.approx(1510.0, abs=2.5)
    assert peaks[1] == pytest.approx(1602.0, abs=2.5)


def test_signal_spectrum_matches_acf_route():
    """Direct-signal and ACF routes must locate the same line."""
    nu0 = 1200.0
    dt = 0.004
    n = 5000
    rng = np.random.default_rng(0)
    t = np.arange(n) * dt
    omega = 2 * np.pi * C_CM_PER_PS * nu0
    x = np.cos(omega * t) + 0.05 * rng.standard_normal(n)
    freq_s, spec_s = spectrum_from_signal(x, dt)
    # one-sided empirical ACF of the same signal
    acf = np.correlate(x - x.mean(), x - x.mean(), "full")[n - 1:] / n
    freq_a, spec_a = spectrum_from_acf(t, acf)
    assert freq_s[np.argmax(spec_s)] == pytest.approx(nu0, abs=3.0)
    assert freq_a[np.argmax(spec_a)] == pytest.approx(nu0, abs=3.0)


def test_nonuniform_lag_grid_rejected():
    t = np.array([0.0, 0.1, 0.3, 0.35])
    with pytest.raises(ValueError, match="uniform"):
        spectrum_from_acf(t, np.ones(4))


def test_unknown_window_rejected():
    with pytest.raises(ValueError, match="window"):
        spectrum_from_signal(np.ones(16), 0.01, window="kaiser")


def test_tracker_file_round_trip(tmp_path, monkeypatch):
    """Files written by DipoleAutocorrelation parse back and average
    into a spectrum: the full production analysis loop."""
    monkeypatch.chdir(tmp_path)
    tr = DipoleAutocorrelation(output_period_steps=10)
    tr.new_reference_every = 500  # two reference segments over the feed
    nu0 = 1000.0
    dt_step_ps = 0.001
    steps = np.arange(0, 1001, 10)
    omega = 2 * np.pi * C_CM_PER_PS * nu0
    # dipole along x oscillating at nu0 (shared phase across segments)
    from cavmd_tpu.core.units import PhysicalConstants as PC

    for s in steps:
        t_ps = s * dt_step_ps
        obs = {
            "timestep": np.array([s]),
            "time_au": np.array([t_ps / PC.TIME_PS_CONVERSION]),
            "dipole": np.array([[np.cos(omega * t_ps), 0.0, 0.0]]),
        }
        tr.consume(obs)

    ts, t_ps, c = read_autocorr_file("dipole_autocorr_0.txt")
    assert len(ts) >= 2 and c[0] == pytest.approx(1.0)

    lag, c_mean, n_seg = read_autocorr_segments("dipole_autocorr")
    assert n_seg >= 2
    freq, spec = spectrum_from_acf(lag, c_mean)
    # short window -> coarse resolution; just nail the line to ~5%
    assert freq[np.argmax(spec)] == pytest.approx(nu0, rel=0.05)


def test_spectrum_cli(tmp_path, monkeypatch):
    """The CLI reads tracker segments and writes a parseable spectrum."""
    monkeypatch.chdir(tmp_path)
    from cavmd_tpu.core.units import PhysicalConstants as PC
    from cavmd_tpu.drivers.spectrum import main as spectrum_main

    tr = DipoleAutocorrelation(output_period_steps=10)
    nu0 = 1400.0
    omega = 2 * np.pi * C_CM_PER_PS * nu0
    for s in range(0, 801, 10):
        t_ps = s * 0.001
        tr.consume({
            "timestep": np.array([s]),
            "time_au": np.array([t_ps / PC.TIME_PS_CONVERSION]),
            "dipole": np.array([[np.cos(omega * t_ps), 0.0, 0.0]]),
        })

    out = spectrum_main(["dipole_autocorr", "--kind", "ir"])
    rows = np.loadtxt(out)
    assert rows.shape[1] == 2
    peak = rows[np.argmax(rows[:, 1]), 0]
    assert peak == pytest.approx(nu0, rel=0.05)

    # rerunning with the CLI's own output in the directory must not
    # parse {prefix}_spectrum.txt as a segment (non-numeric suffix)
    out2 = spectrum_main(["dipole_autocorr", "--kind", "ir"])
    assert out2 == out


def test_fkt_reference_files_round_trip(tmp_path, monkeypatch):
    """FieldAutocorrelationTracker ref files -> averaged F(k,t) decay."""
    monkeypatch.chdir(tmp_path)
    from cavmd_tpu.core.units import PhysicalConstants as PC

    tr = FieldAutocorrelationTracker(
        output_prefix="fkt", output_period_steps=5,
        reference_interval_ps=0.05, max_references=3,
    )
    tau = 0.2  # ps relaxation of the synthetic field
    rng = np.random.default_rng(2)
    base = rng.standard_normal(16) + 1j * rng.standard_normal(16)
    dt_step_ps = 0.001
    for s in range(0, 501, 5):
        t_ps = s * dt_step_ps
        field = base * np.exp(-t_ps / tau)
        tr.consume({
            "timestep": np.array([s]),
            "time_au": np.array([t_ps / PC.TIME_PS_CONVERSION]),
            "rho_k_re": field.real[None],
            "rho_k_im": field.imag[None],
        })

    lag, f_mean, n_ref = read_fkt_references("fkt")
    assert n_ref >= 2
    assert len(lag) >= 5
    # each reference sees F(lag) = |base|^2 e^{-t_ref/tau} e^{-lag/tau}:
    # the averaged curve still decays as e^{-lag/tau}
    ratio = f_mean[1:] / f_mean[:-1]
    expect = np.exp(-(lag[1] - lag[0]) / tau)
    np.testing.assert_allclose(ratio, expect, rtol=1e-3)
