"""Shared benchmark workload builders.

The N=100k large-N configuration is quoted in README / docs and measured
by BOTH ``bench.py`` (the harness one-liner) and
``scripts/bench_large_n.py`` (the exploration tool). A single builder
keeps the two measuring the same physics — duplicated setup drifted once
(mesh/pair-mode knobs existed only in the script).
"""

from __future__ import annotations


def build_large_n(n_mol=50_000, *, mesh=(32, 32, 32), pair_mode="cell",
                  seed=0, dt_fs=0.25):
    """The large-N stress workload: ``n_mol`` diatomics + cavity photon,
    full force mix (cavity + bonds + LJ + Ewald short + PPPM), Bussi
    molecular bath + Langevin cavity bath, f32, constant reference
    density. Returns ``(runner, state, snap, ff)`` where
    ``runner(state, n)`` advances n steps (n static) and returns
    ``(state, obs)``.

    The reference GPU kernel refuses N >= 100k outright
    (CavityForceComputeGPU.cu:395); this is the scaling headline config
    from docs/performance.md.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cavmd_tpu.core import PhysicalConstants as PC
    from cavmd_tpu.core import add_cavity_particle, make_diatomic_system
    from cavmd_tpu.core.system import reference_box_for
    from cavmd_tpu.integrate import (
        ForceField, MethodSpec, init_state, make_step_fn, resolve_methods,
        run_steps,
    )

    snap = make_diatomic_system(
        n_mol, box_L=reference_box_for(n_mol), temperature_K=100.0,
        seed=seed, dtype=np.float64,
    )
    snap = add_cavity_particle(snap, coupling=1e-3, freq_cm1=2000.0,
                               temperature_K=100.0, seed=seed + 1)
    snap = snap.astype(jnp.float32)
    ff = ForceField.create(snap, coupling=1e-3, freq_cm1=2000.0,
                           dtype=jnp.float32, pair_mode=pair_mode,
                           pppm_mesh=tuple(mesh))
    kT = PC.kT_from_kelvin(100.0)
    methods = resolve_methods(snap, (
        MethodSpec(kind="bussi", group="molecular", kT=kT,
                   tau=PC.ps_to_atomic_units(5.0)),
        MethodSpec(kind="langevin", group="cavity", kT=kT,
                   gamma=PC.gamma_from_tau_ps(5.0)),
    ), ff.l_typeid)
    step = make_step_fn(ff, methods)
    state = init_state(snap, ff, dt=PC.fs_to_atomic_units(dt_fs), seed=7)
    runner = jax.jit(lambda s, n: run_steps(step, s, n), static_argnums=(1,))
    return runner, state, snap, ff
