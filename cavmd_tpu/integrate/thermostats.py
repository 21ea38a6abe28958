"""Thermostats: Bussi (with reservoir-energy tracking), Langevin (with
reservoir tally), MTTK (Nose-Hoover), Berendsen — as pure functions.

Rebuilds the reference thermostat family:

- ``BussiReservoirThermostat`` (src/BussiReservoirThermostat.h:43-225):
  stochastic velocity rescaling, Bussi 2007 alpha with the Bussi 2009
  Eq. A8 sign correction (h:210-224) that plain HOOMD Bussi lacks
  (contrast src/Thermostat.h:416-446), and reservoir accumulation
  ``dE_res = KE * (1 - alpha^2)`` (h:86-95).
- Langevin with ``tally_reservoir_energy=True`` (consumed HOOMD surface,
  05_advanced_run.py:658,677-678). Design divergence, documented: instead
  of HOOMD's noise-as-force scheme we use the exact Ornstein-Uhlenbeck
  velocity update (the BAOAB "O" step), which samples the Maxwell
  distribution exactly for any gamma*dt and lets the reservoir tally be the
  *exact* kinetic-energy change — making the universe-energy oracle exact
  for the thermostat part.
- ``MTTKThermostat`` / ``BerendsenThermostat`` (src/Thermostat.h:119-331,
  450-493) for API parity.

All functions are jit/vmap/scan-safe. Group sizes and DOF are static
Python numbers (group membership is by particle type, which never changes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def kinetic_energy(velocity, mass, mask):
    """Group kinetic energy 1/2 sum m v^2 over ``mask``.

    One reduction — a ``psum`` when the particle axis is sharded (the TPU
    equivalent of HOOMD's ``ComputeThermo::compute``).
    """
    w = jnp.where(mask, mass, jnp.zeros((), velocity.dtype))
    return 0.5 * jnp.sum(w[:, None] * velocity**2)


def bussi_noise(key, dof: float, dtype):
    """The two stochastic draws of one Bussi rescaling: (r1, r_gamma).

    Shared by :func:`bussi_rescale_factor` and the fused-integrator path
    (``ops/fused_integrator.py``) so both sample IDENTICAL noise from the
    same key. r1 ~ N(0,1); r_gamma = 2*Gamma((dof-1)/2) for dof > 1 —
    Wilson-Hilferty for a > 30 (moment error O(1/a^2); avoids
    ``jax.random.gamma``'s rejection while_loop, ~55 us/step on TPU,
    measured v5e), exact gamma sampling below that.
    """
    k1, k2 = jax.random.split(key)
    r1 = jax.random.normal(k1, dtype=dtype)
    if dof > 1.0:
        alpha_g = (dof - 1.0) / 2.0
        if alpha_g > 30.0:
            xi = jax.random.normal(k2, dtype=dtype)
            cube = 1.0 - 1.0 / (9.0 * alpha_g) + xi / jnp.sqrt(9.0 * alpha_g)
            g = alpha_g * jnp.maximum(cube, 0.0) ** 3
        else:
            g = jax.random.gamma(k2, alpha_g, dtype=dtype)
        r_gamma = 2.0 * g
    else:
        r_gamma = jnp.zeros((), dtype)
    return r1, r_gamma


def bussi_rescale_factor(K, dof: float, dt, tau, kT, key, *, sign_correction=True):
    """Bussi 2007 stochastic velocity-rescaling factor alpha.

    alpha^2 = c + v(1-c)(r_gamma + r1^2) + 2 r1 sqrt(v(1-c)c),
    c = exp(-dt/tau), v = kT/(2K), r1 ~ N(0,1),
    r_gamma = 2*Gamma((Nf-1)/2) for Nf > 1
    (reference BussiReservoirThermostat.h:177-225).

    With ``sign_correction`` (the Bussi 2009 Eq. A8 fix, h:210-224):
    sign(alpha) = sign(r1 + sqrt(c Nf K / ((1-c) K_bar))), K_bar = kT*Nf/2.
    Plain HOOMD Bussi (Thermostat.h:416-446) always takes +sqrt — pass
    ``sign_correction=False`` for that behavior.

    ``dof`` is static; K, dt, tau, kT may be traced.
    """
    if dof == 0:
        return jnp.ones((), jnp.result_type(K))

    dtype = jnp.result_type(K)
    tau = jnp.asarray(tau, dtype)
    safe_tau = jnp.where(tau != 0.0, tau, jnp.ones((), dtype))
    c = jnp.where(tau != 0.0, jnp.exp(-dt / safe_tau), jnp.zeros((), dtype))

    r1, r_gamma = bussi_noise(key, dof, dtype)

    v = kT / 2.0 / K
    term1 = v * (1.0 - c) * (r_gamma + r1 * r1)
    term2 = 2.0 * r1 * jnp.sqrt(v * (1.0 - c) * c)
    alpha_sq = c + term1 + term2
    alpha_mag = jnp.sqrt(alpha_sq)

    if not sign_correction:
        return alpha_mag

    K_bar = kT * dof / 2.0
    sign_term = r1 + jnp.sqrt(c * dof * K / ((1.0 - c) * K_bar))
    return jnp.where(sign_term >= 0.0, alpha_mag, -alpha_mag)


def bussi_apply(velocity, mass, mask, dof: float, dt, tau, kT, key, *, sign_correction=True):
    """One Bussi rescaling: returns (new_velocity, reservoir_delta).

    reservoir_delta = KE * (1 - alpha^2), positive when energy flows to the
    bath (reference BussiReservoirThermostat.h:83-95). The tally is exact:
    rescaling changes the group KE by exactly (alpha^2 - 1) * KE.
    """
    K = kinetic_energy(velocity, mass, mask)
    alpha = bussi_rescale_factor(
        K, dof, dt, tau, kT, key, sign_correction=sign_correction
    )
    new_v = jnp.where(mask[:, None], alpha * velocity, velocity)
    delta_res = K * (1.0 - alpha * alpha)
    return new_v, delta_res


def langevin_ou_apply(velocity, mass, mask, gamma, kT, dt, key, indices=None):
    """Exact OU (BAOAB "O") step: v' = c v + sqrt((1-c^2) kT/m) xi.

    Returns (new_velocity, reservoir_delta) with
    reservoir_delta = KE_before - KE_after (exact tally; parity role:
    HOOMD Langevin ``tally_reservoir_energy``).

    ``indices``: optional static tuple of the group's particle indices —
    for small groups (the single-photon cavity bath) noise is sampled only
    for those rows instead of the full (N,3) array.
    """
    dtype = velocity.dtype
    c = jnp.exp(-gamma * dt)
    if indices is not None:
        idx = jnp.asarray(indices, jnp.int32)
        sigma = jnp.sqrt((1.0 - c * c) * kT / mass[idx])[:, None]
        noise = jax.random.normal(key, (len(indices), 3), dtype=dtype)
        new_rows = c * velocity[idx] + sigma * noise
        new_v = velocity.at[idx].set(new_rows)
    else:
        sigma = jnp.sqrt((1.0 - c * c) * kT / mass)[:, None]
        noise = jax.random.normal(key, velocity.shape, dtype=dtype)
        new_v = jnp.where(mask[:, None], c * velocity + sigma * noise, velocity)
    ke_before = kinetic_energy(velocity, mass, mask)
    ke_after = kinetic_energy(new_v, mass, mask)
    return new_v, ke_before - ke_after


def brownian_apply(position, velocity, forces, mass, mask, gamma, kT, dt, key):
    """Overdamped (Brownian / Euler-Maruyama) update for one group.

    dx = F dt / (m gamma) + sqrt(2 kT dt / (m gamma)) xi — the overdamped
    limit the reference's own guidance points users to for gamma*dt >> 1
    (src/cavitymd/utils.py:59-64; the method itself exists only here).
    ``gamma`` is the friction *rate* (1/time), matching this module's
    Langevin convention, so the drag coefficient is m*gamma (HOOMD's
    ``md.methods.Brownian`` gamma equals that product).

    Velocities are resampled from the Maxwell distribution each step
    (HOOMD Brownian semantics: velocity carries a kT-consistent sample for
    thermodynamic output, not dynamics). Returns
    (new_position, new_velocity, reservoir_delta); the tally is the exact
    KE change of the resampling — position-space bath work is not a
    conserved-universe quantity in the overdamped limit.
    """
    dtype = position.dtype
    k1, k2 = jax.random.split(key)
    drag = mass * gamma  # (N,)
    noise = jax.random.normal(k1, position.shape, dtype=dtype)
    dx = forces * (dt / drag)[:, None] + (
        jnp.sqrt(2.0 * kT * dt / drag)[:, None] * noise
    )
    new_pos = jnp.where(mask[:, None], position + dx, position)
    vmb = jnp.sqrt(kT / mass)[:, None] * jax.random.normal(
        k2, position.shape, dtype=dtype
    )
    new_v = jnp.where(mask[:, None], vmb, velocity)
    ke_before = kinetic_energy(velocity, mass, mask)
    ke_after = kinetic_energy(new_v, mass, mask)
    return new_pos, new_v, ke_before - ke_after


class MTTKState(NamedTuple):
    """Nose-Hoover internal DOF (xi, eta) — reference Thermostat.h:139-146."""

    xi: jnp.ndarray
    eta: jnp.ndarray


def mttk_rescale_factor(state: MTTKState, dt):
    """exp(-xi dt / 2) — reference Thermostat.h:148-160 (both halves)."""
    return jnp.exp(-0.5 * state.xi * dt)


def mttk_advance(state: MTTKState, current_T, set_T, dof: float, dt, tau):
    """Advance (xi, eta) one step — reference Thermostat.h:162-194.

    xi' = xi + dt/(2 tau^2) (T/T0 - 1) applied twice; eta += xi' dt.
    """
    incr = 0.5 * dt / (tau * tau) * (current_T / set_T - 1.0)
    xi_prime = state.xi + incr
    xi = xi_prime + incr
    eta = state.eta + xi_prime * dt
    return MTTKState(xi=xi, eta=eta)


def mttk_energy(state: MTTKState, dof: float, set_T, tau):
    """Thermostat Hamiltonian contribution — reference Thermostat.h:196-212."""
    return dof * set_T * (state.xi**2 * tau**2 / 2.0 + state.eta)


def mttk_thermalize(key, dof: float, tau):
    """Random initial xi ~ N(0, 1/(dof tau^2)) — reference
    Thermostat.h:273-323 (``thermalizeThermostat``; the rank-0 draw +
    MPI_Bcast pattern becomes a single replicated draw under SPMD)."""
    sigma = jnp.sqrt(1.0 / (dof * tau * tau))
    return MTTKState(xi=sigma * jax.random.normal(key), eta=jnp.zeros(()))


def berendsen_factor(current_T, set_T, dt, tau):
    """lambda = sqrt(1 + dt/tau (T0/T - 1)) — reference Thermostat.h:469-489."""
    return jnp.sqrt(1.0 + dt / tau * (set_T / current_T - 1.0))


def thermalize_velocities(key, mass, mask, kT, *, remove_drift=True):
    """Maxwell-Boltzmann velocity draw for a particle group.

    Parity: ``state.thermalize_particle_momenta`` (consumed HOOMD surface,
    05_advanced_run.py:718,749). Removes the group center-of-mass drift
    when ``remove_drift`` (HOOMD does for the All filter).
    """
    dtype = mass.dtype
    sigma = jnp.sqrt(kT / mass)[:, None]
    v = sigma * jax.random.normal(key, (mass.shape[0], 3), dtype=dtype)
    if remove_drift:
        w = jnp.where(mask, mass, jnp.zeros((), dtype))
        total_m = jnp.sum(w)
        vcm = jnp.sum(w[:, None] * v, axis=0) / total_m
        v = v - vcm[None, :]
    return jnp.where(mask[:, None], v, jnp.zeros((), dtype))
