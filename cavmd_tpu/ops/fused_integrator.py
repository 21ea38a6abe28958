"""Fused integrator kernels: the flagship step's thermostat/VV/RNG tail
as TWO Pallas calls instead of ~25 small XLA ops.

Motivation (VERDICT r3 item 4, measured on v5e at N=501): ~24 us of the
81.9 us step is inter-op sequencing gaps — launch latency proportional to
op COUNT, not work — and ~15 us more is the thermostat/VV/RNG/bookkeeping
tail itself, spread over dozens of (N,3)-sized elementwise ops and scalar
reductions (docs/performance.md step-cost table). The force kernels are
single fused ops already; this module gives the integrator chain the same
treatment. Parity role: the per-step update sequence of the reference's
ConstantVolume + BussiReservoirThermostat + Langevin stack
(src/Thermostat.h two-half-step protocol, src/BussiReservoirThermostat.h
rescale + reservoir tally), re-fused the TPU way.

Two kernels bracket the force computation (which must stay outside — the
pair/PPPM ops are their own fused programs):

- ``pre_force``:  Bussi half-step 1 (group-KE reduction -> alpha with the
  2009 A8 sign fix -> rescale) + first VV kick + drift + periodic rewrap
  with image accumulation.
- ``post_force``: second VV kick + exact-OU Langevin on the (static,
  single-row) cavity photon + the group-KE observables + reservoir
  deltas.

Layout: all (N,3) particle arrays are viewed flat as (1, 3N) — row-major
(N,3) IS the interleaved flat vector, so the reshape is a free bitcast,
there are no pad/slice ops (Mosaic masks the 128-lane tail internally and
reductions respect logical shapes), and per-row quantities (mass, group
masks) become (1, 3N) vectors broadcast at trace time. Scalar inputs
(dt, noise draws, OU coefficients) arrive via one SMEM row; the RNG draws
stay OUTSIDE the kernel (same `stream_key` draws as the unfused path, so
the two paths sample identical noise and differ only in f32 reduction
order).

Supported method pattern (the reference production config): exactly one
``bussi`` on the molecular group + at most one ``langevin`` on the cavity
group with static ``indices`` of length 1. ``make_step_fn`` falls back to
the unfused path for anything else.

Outcome (measured, v5e, N=501, same session A/B): **rejected as the
default** — the two kernels alone cost ~33 µs/step under ``lax.scan``
and the figure is identical at unroll=1 and unroll=4, i.e. it is fixed
per-launch overhead (~16 µs/``pallas_call`` at this size), which exceeds
the ~24 µs of sequencing gaps + XLA tail they replace. Full flagship
step: 14.6k steps/s fused vs 16.5k unfused. Two launches per step is the
floor (the force programs must sit between the half-steps), so the
approach cannot win at this size; kept as a tested opt-in
(``make_step_fn(..., fuse_integrator=True)``) — it becomes relevant if
Mosaic launch cost drops or at sizes where the tail's (N,3) elementwise
work dominates its op count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# SMEM scalar-row slots, pre_force
PRE_DT, PRE_C, PRE_KT, PRE_R1, PRE_RGAMMA = range(5)
PRE_NSCAL = 5
# SMEM scalar-row slots, post_force
POST_DT, POST_COU, POST_SIG, POST_NX, POST_NY, POST_NZ = range(6)
POST_NSCAL = 6


def _pre_force_kernel(scal_ref, v_ref, pos_ref, img_ref, f_ref, mass_ref,
                      mol_ref, box3_ref, v_out, pos_out, img_out, out_scal,
                      *, dof: float):
    """Bussi half 1 + VV kick 1 + drift + rewrap. One grid program."""
    dt = scal_ref[0, PRE_DT]
    c = scal_ref[0, PRE_C]
    kT = scal_ref[0, PRE_KT]
    r1 = scal_ref[0, PRE_R1]
    r_gamma = scal_ref[0, PRE_RGAMMA]

    v = v_ref[...]
    mass = mass_ref[...]
    mol = mol_ref[...]

    # group KE (one masked reduction; the psum-free single-chip case)
    K = 0.5 * jnp.sum(mol * mass * v * v)

    # Bussi 2007 alpha with the 2009 Eq. A8 sign fix (thermostats.py
    # `bussi_rescale_factor`, same formula, SMEM scalar math)
    vfac = kT / (2.0 * K)
    term1 = vfac * (1.0 - c) * (r_gamma + r1 * r1)
    term2 = 2.0 * r1 * jnp.sqrt(vfac * (1.0 - c) * c)
    alpha_sq = c + term1 + term2
    alpha_mag = jnp.sqrt(alpha_sq)
    K_bar = kT * dof / 2.0
    sign_term = r1 + jnp.sqrt(c * dof * K / ((1.0 - c) * K_bar))
    alpha = jnp.where(sign_term >= 0.0, alpha_mag, -alpha_mag)

    v1 = jnp.where(mol > 0.0, alpha * v, v)
    v1 = v1 + (0.5 * dt) * f_ref[...] / mass
    pos1 = pos_ref[...] + dt * v1

    # rewrap (core/box.py wrap_positions semantics): image += floor((x +
    # L/2)/L), x -= image*L — box3 is the per-lane tiled (Lx,Ly,Lz,...)
    L = box3_ref[...]
    d_img = jnp.floor((pos1 + 0.5 * L) / L)
    pos_out[...] = pos1 - d_img * L
    img_out[...] = img_ref[...] + d_img.astype(jnp.int32)
    v_out[...] = v1
    out_scal[0, 0] = K * (1.0 - alpha * alpha)  # bussi reservoir delta


def _post_force_kernel(scal_ref, v_ref, f_ref, mass_ref, mol_ref, ph_ref,
                       nvec_ref, v_out, out_scal):
    """VV kick 2 + photon OU + KE observables. One grid program."""
    dt = scal_ref[0, POST_DT]
    c_ou = scal_ref[0, POST_COU]
    sig = scal_ref[0, POST_SIG]

    mass = mass_ref[...]
    mol = mol_ref[...]
    ph = ph_ref[...]

    v2 = v_ref[...] + (0.5 * dt) * f_ref[...] / mass

    # exact-OU on the photon rows only (ph is the static one-hot; nvec
    # carries the 3 noise values pre-placed on those rows)
    ke_ph_before = 0.5 * jnp.sum(ph * mass * v2 * v2)
    v3 = jnp.where(ph > 0.0, c_ou * v2 + sig * nvec_ref[...], v2)
    ke_ph_after = 0.5 * jnp.sum(ph * mass * v3 * v3)

    ke_mol = 0.5 * jnp.sum(mol * mass * v3 * v3)
    ke_cav = 0.5 * jnp.sum((1.0 - mol) * mass * v3 * v3)

    v_out[...] = v3
    out_scal[0, 0] = ke_mol
    out_scal[0, 1] = ke_cav
    out_scal[0, 2] = ke_ph_before - ke_ph_after  # langevin reservoir delta


class FusedIntegratorPlan:
    """Trace-time constants for the fused kernels (built once per
    ``make_step_fn``; everything here is static)."""

    def __init__(self, ff, methods, n: int, dtype):
        if dtype != jnp.float32:
            raise ValueError("fused integrator is f32-only (TPU path)")
        bussi = [m for m in methods if m.kind == "bussi"]
        langevin = [m for m in methods if m.kind == "langevin"]
        others = [m for m in methods
                  if m.kind not in ("bussi", "langevin", "nve")]
        if (len(bussi) != 1 or bussi[0].group != "molecular"
                or len(langevin) > 1 or others
                or (langevin and (langevin[0].group != "cavity"
                                  or not langevin[0].indices
                                  or len(langevin[0].indices) != 1))):
            raise ValueError(
                "fused integrator supports exactly (bussi molecular "
                "[+ langevin cavity on one photon])"
            )
        if bussi[0].dof is None or bussi[0].dof <= 0.0:
            raise ValueError("fused integrator needs bussi dof > 0")
        self.bussi = bussi[0]
        self.langevin = langevin[0] if langevin else None
        self.i_bussi = list(methods).index(self.bussi)
        self.i_langevin = (
            list(methods).index(self.langevin) if langevin else -1
        )
        self.n = n
        self.n3 = 3 * n
        # static one-hot for the photon rows, flat layout. Kept as NUMPY:
        # the plan is cached across traces, and a jnp array materialized
        # during one trace is that trace's constant-tracer — reusing it in
        # another trace leaks (numpy converts to a fresh constant at each
        # use site). The molecular mask is NOT static here — it derives
        # from ``state.typeid`` (traced), expanded per step by the apply
        # wrappers.
        ph = np.zeros((1, self.n3), np.float32)
        if self.langevin is not None:
            p = int(self.langevin.indices[0])
            ph[0, 3 * p:3 * p + 3] = 1.0
        self.ph3 = ph


def _flat(x):
    """(N,3) -> (1, 3N) — row-major contiguous, so a free bitcast."""
    return x.reshape(1, -1)


def _unflat(x, n):
    return x.reshape(n, 3)


def _expand3(row, n):
    """(N,) per-particle -> (1, 3N) per-coordinate (one broadcast op)."""
    return jnp.broadcast_to(row[:, None], (n, 3)).reshape(1, -1)


def pre_force_apply(plan: FusedIntegratorPlan, position, image, velocity,
                    forces, mass, mol_mask, box_L, dt, c, kT, r1, r_gamma,
                    interpret=False):
    """Returns (position', image', velocity', bussi_reservoir_delta)."""
    n, n3 = plan.n, plan.n3
    dtype = jnp.float32
    scal = jnp.stack([
        jnp.asarray(dt, dtype), jnp.asarray(c, dtype),
        jnp.asarray(kT, dtype), jnp.asarray(r1, dtype),
        jnp.asarray(r_gamma, dtype),
    ]).reshape(1, PRE_NSCAL)
    mass3 = _expand3(mass, n)
    mol3 = _expand3(mol_mask.astype(dtype), n)
    box3 = _flat(jnp.broadcast_to(
        jnp.asarray(box_L, dtype).reshape(1, 3), (n, 3)
    ))
    kern = functools.partial(_pre_force_kernel, dof=float(plan.bussi.dof))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    v1, pos1, img1, out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vspec] * 7,
        out_specs=[vspec, vspec, vspec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((1, n3), dtype),
            jax.ShapeDtypeStruct((1, n3), dtype),
            jax.ShapeDtypeStruct((1, n3), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        interpret=interpret,
    )(scal, _flat(velocity), _flat(position), _flat(image), _flat(forces),
      mass3, mol3, box3)
    return (_unflat(pos1, n), _unflat(img1, n), _unflat(v1, n), out[0, 0])


def post_force_apply(plan: FusedIntegratorPlan, velocity, forces, mass,
                     mol_mask, dt, c_ou, sig_ou, noise3, interpret=False):
    """Returns (velocity', ke_mol, ke_cav, langevin_reservoir_delta)."""
    n, n3 = plan.n, plan.n3
    dtype = jnp.float32
    zero = jnp.zeros((), dtype)
    c_ou = jnp.asarray(c_ou, dtype) if plan.langevin is not None else zero
    sig_ou = jnp.asarray(sig_ou, dtype) if plan.langevin is not None else zero
    nx, ny, nz = (
        (noise3[0], noise3[1], noise3[2]) if plan.langevin is not None
        else (zero, zero, zero)
    )
    scal = jnp.stack([
        jnp.asarray(dt, dtype), c_ou, sig_ou,
        nx.astype(dtype), ny.astype(dtype), nz.astype(dtype),
    ]).reshape(1, POST_NSCAL)
    mass3 = _expand3(mass, n)
    mol3 = _expand3(mol_mask.astype(dtype), n)
    # noise pre-placed on the photon rows: 3 AXPYs on one tiny vector
    if plan.langevin is not None:
        p = int(plan.langevin.indices[0])
        nvec = jnp.zeros((1, n3), dtype)
        nvec = jax.lax.dynamic_update_slice(
            nvec, jnp.stack([nx, ny, nz]).astype(dtype).reshape(1, 3),
            (0, 3 * p),
        )
    else:
        nvec = jnp.zeros((1, n3), dtype)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    v3, out = pl.pallas_call(
        _post_force_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vspec] * 6,
        out_specs=[vspec, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((1, n3), dtype),
            jax.ShapeDtypeStruct((1, 3), dtype),
        ],
        interpret=interpret,
    )(scal, _flat(velocity), _flat(forces), mass3, mol3, plan.ph3, nvec)
    return _unflat(v3, n), out[0, 0], out[0, 1], out[0, 2]
