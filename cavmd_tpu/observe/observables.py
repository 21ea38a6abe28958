"""Observable library: on-device, jit/vmap/scan-safe observable functions.

Rebuilds the reference observable library (src/cavitymd/analysis.py:18-97):
total dipole moment, density field rho(k), Fibonacci k-shell sampling —
plus cavity-mode properties (analysis.py:1324-1368). Unlike the reference
(which pulls a full cpu_local_snapshot to the host every step, SURVEY.md
§3.2), these run inside the scanned step; the host only receives small
per-step result arrays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cavmd_tpu.core.box import unwrap_positions
from cavmd_tpu.core.units import PhysicalConstants


def compute_total_dipole_moment(position, image, box_L, charge):
    """Total dipole with unwrapped positions (analysis.py:18-31)."""
    unwrapped = unwrap_positions(position, image, box_L)
    return charge @ unwrapped


def compute_density_field(position, wavevectors):
    """rho(k) = sum_j exp(i k . r_j) per wavevector (analysis.py:34-47).

    Uses *wrapped* positions like the reference. Returns (nk,) complex.
    """
    kr = position @ wavevectors.T  # (N, nk)
    return jnp.sum(jnp.cos(kr), axis=0) + 1j * jnp.sum(jnp.sin(kr), axis=0)


def generate_fibonacci_sphere(samples: int = 100) -> np.ndarray:
    """Uniform points on the unit sphere via Fibonacci spiral
    (analysis.py:50-66). Host-side; the result is a static constant."""
    i = np.arange(samples, dtype=float)
    phi = np.pi * (3.0 - np.sqrt(5.0))  # golden angle
    y = 1.0 - (i / (samples - 1)) * 2.0
    radius = np.sqrt(1.0 - y * y)
    theta = phi * i
    return np.stack([np.cos(theta) * radius, y, np.sin(theta) * radius], axis=1)


def field_autocorrelation(field0, field_t):
    """mean(Re(F0 * conj(Ft))) over the k-shell (analysis.py:359-364)."""
    return jnp.mean(jnp.real(field0 * jnp.conj(field_t)))


def cavity_mode_properties(ke_cavity, cavity_harmonic_energy):
    """(kinetic, potential, total, temperature) of the photon mode.

    Parity: CavityModeTracker.compute_cavity_properties
    (analysis.py:1324-1368) — PE is the *harmonic* cavity energy only;
    T = (2/3) KE / k_B.
    """
    total = ke_cavity + cavity_harmonic_energy
    temperature = (2.0 / 3.0) * ke_cavity / PhysicalConstants.KB_HARTREE_PER_K
    return ke_cavity, cavity_harmonic_energy, total, temperature


def kinetic_temperature(kinetic_energy, n_dof):
    """T = 2 KE / (N_dof k_B) (analysis.py:548-551)."""
    return 2.0 * kinetic_energy / (n_dof * PhysicalConstants.KB_HARTREE_PER_K)


def make_extra_obs(
    *,
    dipole: bool = False,
    wavevectors: np.ndarray | None = None,
):
    """Build an ``extra_obs(state) -> dict`` hook for the step function.

    The returned per-step entries stream to the host with the energy audit:
    - 'dipole': (3,) total dipole (for DipoleAutocorrelation);
    - 'rho_k_re'/'rho_k_im': (nk,) density field (for F(k,t)).

    The returned callable carries its spec as attributes (``.dipole``,
    ``.wavevectors``) so the domain-decomposed runner can compute the SAME
    observables from shard-local partial sums + one psum instead of a
    global state (parallel/domain.py) — an opaque state-based callable
    cannot run on that path and falls back to GSPMD sharding.
    """
    wv = None if wavevectors is None else jnp.asarray(wavevectors)

    def extra(state):
        out = {}
        if dipole:
            out["dipole"] = compute_total_dipole_moment(
                state.position, state.image, state.box_L, state.charge
            )
        if wv is not None:
            rho = compute_density_field(state.position, wv.astype(state.position.dtype))
            out["rho_k_re"] = jnp.real(rho)
            out["rho_k_im"] = jnp.imag(rho)
        return out

    extra.dipole = dipole
    extra.wavevectors = None if wavevectors is None else np.asarray(wavevectors)
    return extra
