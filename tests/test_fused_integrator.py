"""Fused integrator kernels (ops/fused_integrator.py): the two-Pallas-call
step must reproduce the unfused step — same RNG draws, same update
sequence, f32-reduction-order-level agreement — in interpret mode on CPU.

Parity role: the per-step sequence of the reference's ConstantVolume +
BussiReservoirThermostat + Langevin stack (src/Thermostat.h two-half-step
protocol, src/BussiReservoirThermostat.h rescale + tally), fused the TPU
way (VERDICT r3 item 4: op-count attack on the flagship's sequencing
gaps).
"""

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


def _build(n_mol=30, box_L=25.0, pair_mode=None, langevin=True):
    snap = make_diatomic_system(
        n_mol, box_L=box_L, temperature_K=100.0, seed=0, dtype=np.float64
    )
    snap = add_cavity_particle(
        snap, coupling=1e-3, freq_cm1=2000.0, temperature_K=100.0, seed=1
    )
    snap = snap.astype(jnp.float32)
    kwargs = dict(coupling=1e-3, freq_cm1=2000.0, pppm_mesh=(8, 8, 8),
                  r_cut=8.0)
    if pair_mode:
        kwargs["pair_mode"] = pair_mode
    ff = ForceField.create(snap, **kwargs)
    kT = PC.kT_from_kelvin(100.0)
    specs = [MethodSpec(kind="bussi", group="molecular", kT=kT,
                        tau=PC.ps_to_atomic_units(0.1))]
    if langevin:
        specs.append(MethodSpec(kind="langevin", group="cavity", kT=kT,
                                gamma=PC.gamma_from_tau_ps(0.1)))
    else:
        specs.append(MethodSpec(kind="nve", group="cavity"))
    methods = resolve_methods(snap, tuple(specs), ff.l_typeid)
    state = init_state(snap, ff, dt=PC.fs_to_atomic_units(0.5), seed=7)
    return snap, ff, methods, state


@pytest.mark.parametrize("pair_mode", [None, "cell"])
def test_fused_matches_unfused(pair_mode):
    """8 fused steps track the unfused trajectory and obs to f32
    reduction-order tolerance (identical RNG draws by construction)."""
    snap, ff, methods, state = _build(pair_mode=pair_mode)
    step_ref = make_step_fn(ff, methods, fuse_integrator=False)
    step_fus = make_step_fn(ff, methods, fuse_integrator=True)
    fin_r, obs_r = jax.jit(lambda s: run_steps(step_ref, s, 8))(state)
    fin_f, obs_f = jax.jit(lambda s: run_steps(step_fus, s, 8))(state)

    np.testing.assert_allclose(
        np.asarray(fin_f.position), np.asarray(fin_r.position),
        rtol=3e-5, atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fin_f.velocity), np.asarray(fin_r.velocity),
        rtol=3e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(fin_f.image), np.asarray(fin_r.image),
    )
    for k in obs_r:
        np.testing.assert_allclose(
            np.asarray(obs_f[k]), np.asarray(obs_r[k]),
            rtol=2e-3, atol=1e-5, err_msg=f"obs[{k}]",
        )


def test_fused_single_step_tight():
    """ONE step (before chaos amplifies rounding) matches tightly,
    including both reservoir tallies."""
    snap, ff, methods, state = _build()
    step_ref = make_step_fn(ff, methods, fuse_integrator=False)
    step_fus = make_step_fn(ff, methods, fuse_integrator=True)
    s_r, o_r = jax.jit(step_ref)(state)
    s_f, o_f = jax.jit(step_fus)(state)
    np.testing.assert_allclose(
        np.asarray(s_f.position), np.asarray(s_r.position),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(s_f.bussi_reservoir), np.asarray(s_r.bussi_reservoir),
        rtol=1e-4, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(s_f.langevin_reservoir),
        np.asarray(s_r.langevin_reservoir), rtol=1e-4, atol=1e-10,
    )
    assert int(s_f.timestep) == int(s_r.timestep) == int(state.timestep) + 1


def test_fused_no_langevin():
    """bussi-only pattern (cavity NVE) also fuses."""
    snap, ff, methods, state = _build(langevin=False)
    step_ref = make_step_fn(ff, methods, fuse_integrator=False)
    step_fus = make_step_fn(ff, methods, fuse_integrator=True)
    s_r, _ = jax.jit(step_ref)(state)
    s_f, _ = jax.jit(step_fus)(state)
    np.testing.assert_allclose(
        np.asarray(s_f.velocity), np.asarray(s_r.velocity),
        rtol=1e-5, atol=1e-7,
    )


def test_fused_vmap_replicas():
    """The fused step works under vmap (the replica batch axis)."""
    from cavmd_tpu.parallel import init_replica_states
    from cavmd_tpu.parallel.replicas import make_replica_step

    snap, ff, methods, state = _build()
    kT = PC.kT_from_kelvin(100.0)
    batched = init_replica_states(
        snap, ff, n_replicas=3, dt=PC.fs_to_atomic_units(0.5), seed=0, kT=kT
    )
    vref = make_replica_step(make_step_fn(ff, methods, fuse_integrator=False))
    vfus = make_replica_step(make_step_fn(ff, methods, fuse_integrator=True))
    fr, _ = jax.jit(lambda s: run_steps(vref, s, 4))(batched)
    ff_, _ = jax.jit(lambda s: run_steps(vfus, s, 4))(batched)
    np.testing.assert_allclose(
        np.asarray(ff_.position), np.asarray(fr.position),
        rtol=3e-5, atol=3e-5,
    )


def test_fused_rejects_unsupported_patterns():
    """mttk molecular bath: fuse_integrator=True raises; auto (None)
    silently falls back to the unfused path."""
    snap = make_diatomic_system(10, box_L=20.0, temperature_K=100.0,
                                seed=0, dtype=np.float64)
    snap = add_cavity_particle(snap, coupling=1e-3, freq_cm1=2000.0,
                               temperature_K=100.0, seed=1)
    snap = snap.astype(jnp.float32)
    ff = ForceField.create(snap, coupling=1e-3, pppm_mesh=(8, 8, 8),
                           r_cut=8.0)
    kT = PC.kT_from_kelvin(100.0)
    methods = resolve_methods(
        snap,
        (
            MethodSpec(kind="mttk", group="molecular", kT=kT,
                       tau=PC.ps_to_atomic_units(0.1)),
            MethodSpec(kind="nve", group="cavity"),
        ),
        ff.l_typeid,
    )
    state = init_state(snap, ff, dt=PC.fs_to_atomic_units(0.5), seed=7)
    step = make_step_fn(ff, methods, fuse_integrator=True)
    with pytest.raises(ValueError, match="fused integrator"):
        jax.jit(step)(state)
    step_auto = make_step_fn(ff, methods)  # auto: always unfused (A/B loss)
    jax.jit(step_auto)(state)  # must not raise
