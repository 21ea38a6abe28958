from cavmd_tpu.integrate.forcefield import ForceField
from cavmd_tpu.integrate.integrator import (
    MDState,
    MethodSpec,
    init_state,
    make_step_fn,
    potential_energy,
    resolve_methods,
    run_steps,
    universe_energy,
)
from cavmd_tpu.integrate.adaptive import compute_optimal_dt, make_adaptive_step
from cavmd_tpu.integrate.thermostats import (
    MTTKState,
    berendsen_factor,
    bussi_apply,
    bussi_rescale_factor,
    kinetic_energy,
    langevin_ou_apply,
    mttk_advance,
    mttk_energy,
    mttk_rescale_factor,
    mttk_thermalize,
    thermalize_velocities,
)
from cavmd_tpu.integrate.rng import master_key, stream_key

__all__ = [
    "ForceField",
    "MDState",
    "MethodSpec",
    "init_state",
    "make_step_fn",
    "potential_energy",
    "resolve_methods",
    "run_steps",
    "universe_energy",
    "compute_optimal_dt",
    "make_adaptive_step",
    "MTTKState",
    "berendsen_factor",
    "bussi_apply",
    "bussi_rescale_factor",
    "kinetic_energy",
    "langevin_ou_apply",
    "mttk_advance",
    "mttk_energy",
    "mttk_rescale_factor",
    "mttk_thermalize",
    "thermalize_velocities",
    "master_key",
    "stream_key",
]
