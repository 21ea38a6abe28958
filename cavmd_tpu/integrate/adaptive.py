"""Adaptive timestep control with exponential error-tolerance ramping.

Rebuilds ``AdaptiveTimestepUpdater`` (reference src/cavitymd/simulation.py:
11-143) as a pure on-device update — no snapshot pulls, no host round trip:

- dt = sqrt(tol / sum_i |F_i| / m_i) from the current total force
  (simulation.py:84-92);
- tol(t) = tol_target - (tol_target - tol_0) * exp(-t / tau_ramp) with
  tau_ramp = 50 ps and tol_0 = initial_fraction * tol_target
  (simulation.py:59-64; defaults 05_advanced_run.py:842-844).

The reference also rewrites thermostat gamma/tau on every update
(simulation.py:98-129) — a no-op in this framework: gamma and tau are
physical time constants in a.u., independent of dt, and are kept constant
in the MethodSpec.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cavmd_tpu.core.units import PhysicalConstants
from cavmd_tpu.integrate.integrator import MDState


def compute_optimal_dt(forces, mass, tolerance):
    """dt = sqrt(tol / sum |F_i|/m_i) (simulation.py:84-92)."""
    fnorm = jnp.sqrt(jnp.sum(forces * forces, axis=1))
    s = jnp.sum(fnorm / mass)
    return jnp.sqrt(tolerance / jnp.maximum(s, jnp.finfo(forces.dtype).tiny))


def make_adaptive_step(
    step_fn,
    *,
    error_tolerance: float,
    initial_fraction: float = 1e-3,
    time_constant_ps: float = 50.0,
    period: int = 1,
):
    """Wrap a step function with the adaptive-dt controller.

    Every ``period`` steps the controller recomputes the tolerance ramp and
    sets dt from the cached forces — all inside the scanned program
    (``lax.cond`` on the step counter; SURVEY.md §7 milestone 7).
    """
    target = float(error_tolerance)
    initial = target * float(initial_fraction)
    inv_tau = 1.0 / float(time_constant_ps)

    def update(state: MDState) -> MDState:
        dtype = state.position.dtype
        t_ps = state.time_au * PhysicalConstants.TIME_PS_CONVERSION
        tol = target - (target - initial) * jnp.exp(-t_ps * inv_tau)
        new_dt = compute_optimal_dt(state.forces, state.mass, tol)
        return state.replace(
            dt=new_dt.astype(dtype), error_tolerance=tol.astype(dtype)
        )

    def astep(state: MDState):
        state = jax.lax.cond(
            state.timestep % period == 0, update, lambda s: s, state
        )
        new_state, obs = step_fn(state)
        # logged like the reference's ('Adaptive','error_tolerance') entry
        obs["error_tolerance"] = state.error_tolerance
        return new_state, obs

    return astep
