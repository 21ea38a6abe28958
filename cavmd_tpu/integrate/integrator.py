"""The MD integrator: one pure, fused step function under ``lax.scan``.

This inverts the reference architecture (SURVEY.md §3.2): where HOOMD's C++
integrator calls back into plugin force/thermostat objects with 2-3 host
syncs per step (CavityForceComputeGPU.cu:549,597; GPU.cc:195-204), here the
*entire* step — two-group thermostatting, velocity-Verlet, all forces, the
cavity's global dipole reduction, reservoir accounting, observables — is a
single traced function. ``lax.scan`` chains thousands of steps into one
XLA program; nothing touches the host until a chunk of observables is
streamed out.

Integration protocol per step (HOOMD two-half-step thermostat protocol,
src/Thermostat.h:44-73, adapted to a symmetric, exactly-tallied form):

1. rescale half 1: Bussi alpha from KE(v(t)) applied to v(t) (reservoir
   += KE (1-alpha^2)); MTTK/Berendsen factor applied.
2. velocity-Verlet: v += dt/2 a(t); x += dt v; re-wrap.
3. all forces recomputed (fused; one dipole psum).
4. v += dt/2 a(t+dt).
5. rescale half 2 (MTTK only) + MTTK (xi, eta) advance.
6. Langevin groups: exact OU velocity update, reservoir += KE loss.

Group membership is by particle type (molecular = not-'L', cavity = 'L'),
so masks and DOF are static.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cavmd_tpu.core.box import rewrap
from cavmd_tpu.core.snapshot import Snapshot
from cavmd_tpu.integrate.forcefield import ForceField
from cavmd_tpu.integrate.rng import (
    STREAM_BROWNIAN,
    STREAM_BUSSI,
    STREAM_LANGEVIN,
    master_key,
    stream_key,
)
from cavmd_tpu.integrate.thermostats import (
    MTTKState,
    berendsen_factor,
    brownian_apply,
    bussi_apply,
    kinetic_energy,
    langevin_ou_apply,
    mttk_advance,
    mttk_rescale_factor,
)

# group slots for reservoir bookkeeping (index into the (2,) accumulators)
MOLECULAR, CAVITY = 0, 1


class MethodSpec(NamedTuple):
    """Static description of one integration method (HOOMD ``methods`` entry).

    Parity: reference two-bath split (05_advanced_run.py:610-695) —
    methods[0] = molecular bath over Type['O','N'], methods[1] = cavity bath
    over Type['L'], each one of bussi | langevin | mttk | berendsen | nve.
    """

    kind: str  # 'nve' | 'bussi' | 'langevin' | 'mttk' | 'berendsen' | 'brownian'
    group: str  # 'molecular' | 'cavity' | 'all'
    kT: float = 0.0
    tau: float = 0.0  # thermostat time constant, a.u. (bussi/mttk/berendsen)
    gamma: float = 0.0  # friction, 1/a.u. (langevin)
    dof: float = 0.0  # translational DOF of the group (filled by build)
    indices: tuple | None = None  # static member indices for small groups


@dataclasses.dataclass(frozen=True)
class MDState:
    """Full dynamic state of the simulation — one pytree through scan."""

    # particle data
    position: jnp.ndarray
    image: jnp.ndarray
    velocity: jnp.ndarray
    mass: jnp.ndarray
    charge: jnp.ndarray
    typeid: jnp.ndarray
    bond_group: jnp.ndarray
    bond_typeid: jnp.ndarray
    box_L: jnp.ndarray
    # cached forces F(t) (avoids recomputation at step start)
    forces: jnp.ndarray
    # time — Kahan-compensated accumulation: in f32, once t ~ 1e8 a.u.
    # (~2.4 ns) the per-step dt (~10 a.u.) falls below the ulp and naive
    # accumulation stalls; the compensation term keeps long runs exact
    dt: jnp.ndarray
    time_au: jnp.ndarray
    time_comp: jnp.ndarray  # Kahan compensation
    timestep: jnp.ndarray  # int32
    # RNG
    key: jnp.ndarray
    # thermostat accumulators: [molecular, cavity] slots
    bussi_reservoir: jnp.ndarray  # (2,) cumulative
    bussi_reservoir_rot: jnp.ndarray  # (2,) rotational (0 for point particles)
    bussi_instantaneous: jnp.ndarray  # (2,) last-step delta
    langevin_reservoir: jnp.ndarray  # (2,)
    mttk: MTTKState  # xi/eta arrays of shape (2,)
    # adaptive timestep controller state
    error_tolerance: jnp.ndarray  # current effective tolerance (0 = fixed dt)
    # carried cell list (cell mode with skin > 0): rebuilt inside the step
    # only when some particle moved > skin/2 since `cell_anchor` (the HOOMD
    # displacement-triggered rebuild). None = rebuild every step.
    cell_list: object = None
    cell_anchor: jnp.ndarray = None

    def replace(self, **kw) -> "MDState":
        return dataclasses.replace(self, **kw)


jax.tree_util.register_dataclass(
    MDState,
    data_fields=[
        "position", "image", "velocity", "mass", "charge", "typeid",
        "bond_group", "bond_typeid", "box_L", "forces",
        "dt", "time_au", "time_comp", "timestep", "key",
        "bussi_reservoir", "bussi_reservoir_rot", "bussi_instantaneous",
        "langevin_reservoir", "mttk", "error_tolerance",
        "cell_list", "cell_anchor",
    ],
    meta_fields=[],
)


def group_mask(typeid, l_typeid: int, group: str, ghost_typeid: int = -1):
    """Typed group masks; padded ghost particles (sharding, see
    parallel/mesh.py) belong to NO group — counting them into a thermostat
    group would inflate its DOF and skew the target temperature."""
    not_ghost = typeid != ghost_typeid if ghost_typeid >= 0 else True
    if group == "molecular":
        return (typeid != l_typeid) & not_ghost
    if group == "cavity":
        return typeid == l_typeid
    if group == "all":
        return jnp.ones_like(typeid, dtype=bool) & not_ghost
    raise ValueError(f"unknown group '{group}'")


def group_slot(group: str) -> int:
    return CAVITY if group == "cavity" else MOLECULAR


def resolve_methods(
    snapshot: Snapshot, methods: Tuple[MethodSpec, ...], l_typeid: int
) -> Tuple[MethodSpec, ...]:
    """Fill in static group DOF counts (3 * N_group; the convention the
    reference energy audit uses, analysis.py:548-551)."""
    typeid = np.asarray(snapshot.typeid)
    ghost_typeid = (
        snapshot.types.index("__ghost__") if "__ghost__" in snapshot.types
        else -1
    )
    not_ghost = typeid != ghost_typeid
    out = []
    for m in methods:
        if m.group == "molecular":
            members = np.where((typeid != l_typeid) & not_ghost)[0]
        elif m.group == "cavity":
            members = np.where(typeid == l_typeid)[0]
        else:
            members = np.where(not_ghost)[0]
        n = len(members)
        # keep static member indices for small groups so stochastic kicks
        # sample only those rows (the cavity bath touches one particle)
        indices = tuple(int(i) for i in members) if n <= 8 else None
        out.append(m._replace(dof=3.0 * n, indices=indices))
    return tuple(out)


def init_state(
    snapshot: Snapshot,
    ff: ForceField,
    *,
    dt: float,
    seed: int = 0,
    error_tolerance: float = 0.0,
    rng_impl: str | None = None,
) -> MDState:
    """Build the initial MDState (computes initial forces once, jitted —
    eager op-by-op dispatch costs ~95 s at N=100k)."""
    dtype = snapshot.position.dtype
    forces, _ = jax.jit(ff.compute)(
        snapshot.position, snapshot.image, snapshot.box_L, snapshot.charge,
        snapshot.typeid, snapshot.bond_group, snapshot.bond_typeid,
    )
    cell_list = cell_anchor = None
    if (ff.pair_mode in ("cell", "zcol") and ff.cell_cfg is not None
            and ff.cell_cfg[3] > 0):
        # skin > 0: carry the cell list; the step rebuilds it on demand
        cell_list = jax.jit(ff.build_cells)(snapshot.position, snapshot.box_L)
        cell_anchor = snapshot.position
    z2 = jnp.zeros((2,), dtype)
    return MDState(
        position=snapshot.position,
        image=snapshot.image,
        velocity=snapshot.velocity,
        mass=snapshot.mass,
        charge=snapshot.charge,
        typeid=snapshot.typeid,
        bond_group=snapshot.bond_group,
        bond_typeid=snapshot.bond_typeid,
        box_L=snapshot.box_L,
        forces=forces,
        dt=jnp.asarray(dt, dtype),
        time_au=jnp.zeros((), dtype),
        time_comp=jnp.zeros((), dtype),
        timestep=jnp.zeros((), jnp.int32),
        key=master_key(seed, rng_impl),
        bussi_reservoir=z2,
        bussi_reservoir_rot=z2,
        bussi_instantaneous=z2,
        langevin_reservoir=z2,
        mttk=MTTKState(xi=z2, eta=z2),
        error_tolerance=jnp.asarray(error_tolerance, dtype),
        cell_list=cell_list,
        cell_anchor=cell_anchor,
    )


def make_step_fn(ff: ForceField, methods: Tuple[MethodSpec, ...], extra_obs=None,
                 fuse_integrator: bool | None = None):
    """Build the fused per-step function ``step(state) -> (state, obs)``.

    ``obs`` carries the per-step energy audit (every column of the
    reference EnergyTracker, analysis.py:661-671, computed on-device).
    ``extra_obs(state) -> dict`` optionally appends observables (dipole,
    rho(k), ...) computed on-device inside the same fused step.

    ``fuse_integrator``: run the thermostat/VV/RNG tail as two Pallas
    kernels (``ops/fused_integrator.py``) instead of ~25 small XLA ops.
    This was the op-count attack on the flagship's inter-op sequencing
    gaps — and it LOST the A/B: two Pallas launches cost ~33 µs/step at
    N=501 on v5e (unroll-invariant, i.e. fixed launch overhead), more
    than the ~24 µs of gaps + tail they eliminate; full-step 14.6k vs
    16.5k steps/s (docs/performance.md "Step-cost breakdown"). So
    ``None`` (auto, the default) keeps it OFF; ``True`` opts in
    (interpret-mode off-TPU, for tests — and the measured-rejection
    record if Pallas launch cost ever drops); ``False`` disables
    explicitly. The fused path draws the SAME per-step RNG as the
    unfused one and differs only in f32 reduction order.
    """
    l_typeid = ff.l_typeid
    ghost_typeid = ff.ghost_typeid

    fused_cache = {}  # n -> FusedIntegratorPlan | None (built at trace time)

    def _fused_plan(n, dtype):
        if fuse_integrator is not True:
            # auto stays off: measured 12% slower than the unfused XLA
            # tail at the flagship size (launch overhead, see docstring)
            return None
        key = (n, jnp.dtype(dtype).name)
        if key not in fused_cache:
            from cavmd_tpu.ops.fused_integrator import FusedIntegratorPlan

            try:
                fused_cache[key] = FusedIntegratorPlan(ff, methods, n, dtype)
            except ValueError:
                if fuse_integrator:  # explicitly requested: surface it
                    raise
                fused_cache[key] = None
        return fused_cache[key]

    def _cond_rebuild(state, pos):
        """Carried cell list: rebuild only when some particle has moved
        more than skin/2 since the anchor positions (Verlet-skin
        validity; the HOOMD nlist buffer policy). ``lax.cond`` executes
        one branch, so the O(N log N) argsort rebuild is skipped on most
        steps."""
        from cavmd_tpu.core.box import minimum_image

        half_skin = 0.5 * ff.cell_cfg[3]
        disp = minimum_image(pos - state.cell_anchor, state.box_L)
        disp2 = jnp.sum(disp * disp, axis=-1)
        if ff.pair_inert is not None:
            # pair-inert particles (photon, ghosts) never affect a tile;
            # the m=1 photon moves ~0.3 bohr/step and would otherwise
            # trigger a rebuild every step (measured)
            disp2 = jnp.where(ff.pair_inert, 0.0, disp2)
        need = jnp.max(disp2) > half_skin * half_skin
        return jax.lax.cond(
            need,
            lambda: (ff.build_cells(pos, state.box_L), pos),
            lambda: (state.cell_list, state.cell_anchor),
        )

    def _finish(state, pos, image, v, forces, energies, bussi_res,
                bussi_inst, langevin_res, mttk, clist, anchor, ke_mol,
                ke_cav):
        """Shared step tail: Kahan time, state replace, obs dict."""
        dt = state.dt
        y = dt - state.time_comp
        t_new = state.time_au + y
        comp_new = (t_new - state.time_au) - y
        new_state = state.replace(
            position=pos,
            image=image,
            velocity=v,
            forces=forces,
            time_au=t_new,
            time_comp=comp_new,
            timestep=state.timestep + 1,
            bussi_reservoir=bussi_res,
            bussi_instantaneous=bussi_inst,
            langevin_reservoir=langevin_res,
            mttk=mttk,
            cell_list=clist,
            cell_anchor=anchor,
        )
        obs = dict(energies)
        obs["kinetic_molecular"] = ke_mol
        obs["kinetic_cavity"] = ke_cav
        obs["bussi_reservoir_molecular"] = bussi_res[MOLECULAR]
        obs["bussi_reservoir_cavity"] = bussi_res[CAVITY]
        obs["langevin_reservoir_molecular"] = langevin_res[MOLECULAR]
        obs["langevin_reservoir_cavity"] = langevin_res[CAVITY]
        obs["dt"] = dt
        obs["time_au"] = new_state.time_au
        obs["timestep"] = new_state.timestep
        if extra_obs is not None:
            obs.update(extra_obs(new_state))
        return new_state, obs

    def _fused_step(state: MDState, plan):
        """The fused-kernel step: Pallas pre-force + forces + Pallas
        post-force. Same RNG draws and update sequence as the unfused
        path below; differs only in f32 reduction order."""
        from cavmd_tpu.integrate.thermostats import bussi_noise
        from cavmd_tpu.ops.fused_integrator import (
            post_force_apply,
            pre_force_apply,
        )

        dtype = state.position.dtype
        dt = state.dt
        interp = jax.default_backend() != "tpu"
        mol_mask = group_mask(state.typeid, l_typeid, "molecular",
                              ghost_typeid)

        mb = plan.bussi
        key_b = stream_key(state.key, STREAM_BUSSI, state.timestep,
                           plan.i_bussi)
        r1, r_gamma = bussi_noise(key_b, mb.dof, dtype)
        tau = jnp.asarray(mb.tau, dtype)
        safe_tau = jnp.where(tau != 0.0, tau, jnp.ones((), dtype))
        c = jnp.where(tau != 0.0, jnp.exp(-dt / safe_tau),
                      jnp.zeros((), dtype))

        pos, image, v, dres_b = pre_force_apply(
            plan, state.position, state.image, state.velocity,
            state.forces, state.mass, mol_mask, state.box_L, dt, c,
            jnp.asarray(mb.kT, dtype), r1, r_gamma, interpret=interp,
        )
        bussi_res = state.bussi_reservoir.at[MOLECULAR].add(dres_b)
        bussi_inst = state.bussi_instantaneous.at[MOLECULAR].set(dres_b)

        clist = anchor = None
        if state.cell_list is not None:
            clist, anchor = _cond_rebuild(state, pos)

        forces, energies = ff.compute(
            pos, image, state.box_L, state.charge, state.typeid,
            state.bond_group, state.bond_typeid, clist=clist,
        )

        langevin_res = state.langevin_reservoir
        if plan.langevin is not None:
            ml = plan.langevin
            key_l = stream_key(state.key, STREAM_LANGEVIN, state.timestep,
                               plan.i_langevin)
            # same (1, 3) draw as langevin_ou_apply's indices path
            noise = jax.random.normal(key_l, (1, 3), dtype=dtype).reshape(3)
            gamma = jnp.asarray(ml.gamma, dtype)
            c_ou = jnp.exp(-gamma * dt)
            idx = int(ml.indices[0])
            sig = jnp.sqrt(
                (1.0 - c_ou * c_ou) * jnp.asarray(ml.kT, dtype)
                / state.mass[idx]
            )
            v, ke_mol, ke_cav, dres_l = post_force_apply(
                plan, v, forces, state.mass, mol_mask, dt, c_ou, sig,
                (noise[0], noise[1], noise[2]), interpret=interp,
            )
            langevin_res = langevin_res.at[CAVITY].add(dres_l)
        else:
            v, ke_mol, ke_cav, _ = post_force_apply(
                plan, v, forces, state.mass, mol_mask, dt, None, None,
                None, interpret=interp,
            )

        return _finish(state, pos, image, v, forces, energies, bussi_res,
                       bussi_inst, langevin_res, state.mttk, clist, anchor,
                       ke_mol, ke_cav)

    def step(state: MDState):
        dtype = state.position.dtype
        dt = state.dt
        v = state.velocity
        bussi_res = state.bussi_reservoir
        bussi_inst = state.bussi_instantaneous
        langevin_res = state.langevin_reservoir
        mttk = state.mttk

        plan = (_fused_plan(v.shape[0], dtype)
                if v.ndim == 2 and dtype == jnp.float32 else None)
        if plan is not None:
            return _fused_step(state, plan)

        # ---- thermostat half 1 ----
        for i, m in enumerate(methods):
            mask = group_mask(state.typeid, l_typeid, m.group, ghost_typeid)
            slot = group_slot(m.group)
            if m.kind == "bussi":
                key = stream_key(state.key, STREAM_BUSSI, state.timestep, i)
                v, dres = bussi_apply(
                    v, state.mass, mask, m.dof, dt,
                    jnp.asarray(m.tau, dtype), jnp.asarray(m.kT, dtype), key,
                )
                bussi_res = bussi_res.at[slot].add(dres)
                bussi_inst = bussi_inst.at[slot].set(dres)
            elif m.kind == "mttk":
                alpha = mttk_rescale_factor(
                    MTTKState(xi=mttk.xi[slot], eta=mttk.eta[slot]), dt
                )
                v = jnp.where(mask[:, None], alpha * v, v)
            elif m.kind == "berendsen":
                ke = kinetic_energy(v, state.mass, mask)
                cur_T = 2.0 * ke / m.dof
                lam = berendsen_factor(
                    cur_T, jnp.asarray(m.kT, dtype), dt, jnp.asarray(m.tau, dtype)
                )
                v = jnp.where(mask[:, None], lam * v, v)

        # ---- velocity Verlet ----
        inv_m = 1.0 / state.mass[:, None]
        v = v + 0.5 * dt * state.forces * inv_m
        pos = state.position + dt * v
        # Brownian groups: overdamped Euler-Maruyama drift replaces the VV
        # drift; velocities are Maxwell-resampled and must not receive the
        # second VV kick below
        brownian_mask = None
        for i, m in enumerate(methods):
            if m.kind == "brownian":
                mask = group_mask(state.typeid, l_typeid, m.group, ghost_typeid)
                slot = group_slot(m.group)
                key = stream_key(state.key, STREAM_BROWNIAN, state.timestep, i)
                bpos, bv, dres = brownian_apply(
                    state.position, state.velocity, state.forces, state.mass,
                    mask, jnp.asarray(m.gamma, dtype), jnp.asarray(m.kT, dtype),
                    dt, key,
                )
                pos = jnp.where(mask[:, None], bpos, pos)
                v = jnp.where(mask[:, None], bv, v)
                langevin_res = langevin_res.at[slot].add(dres)
                brownian_mask = (
                    mask if brownian_mask is None else brownian_mask | mask
                )
        pos, image = rewrap(pos, state.image, state.box_L)

        clist = anchor = None
        if state.cell_list is not None:
            clist, anchor = _cond_rebuild(state, pos)

        forces, energies = ff.compute(
            pos, image, state.box_L, state.charge, state.typeid,
            state.bond_group, state.bond_typeid, clist=clist,
        )
        kick2 = 0.5 * dt * forces * inv_m
        if brownian_mask is not None:
            kick2 = jnp.where(brownian_mask[:, None], 0.0, kick2)
        v = v + kick2

        # ---- thermostat half 2 (MTTK) + Langevin O-step ----
        for i, m in enumerate(methods):
            mask = group_mask(state.typeid, l_typeid, m.group, ghost_typeid)
            slot = group_slot(m.group)
            if m.kind == "mttk":
                st = MTTKState(xi=mttk.xi[slot], eta=mttk.eta[slot])
                alpha = mttk_rescale_factor(st, dt)
                v = jnp.where(mask[:, None], alpha * v, v)
                ke = kinetic_energy(v, state.mass, mask)
                cur_T = 2.0 * ke / m.dof
                st = mttk_advance(
                    st, cur_T, jnp.asarray(m.kT, dtype), m.dof, dt,
                    jnp.asarray(m.tau, dtype),
                )
                mttk = MTTKState(
                    xi=mttk.xi.at[slot].set(st.xi),
                    eta=mttk.eta.at[slot].set(st.eta),
                )
            elif m.kind == "langevin":
                key = stream_key(state.key, STREAM_LANGEVIN, state.timestep, i)
                v, dres = langevin_ou_apply(
                    v, state.mass, mask, jnp.asarray(m.gamma, dtype),
                    jnp.asarray(m.kT, dtype), dt, key, indices=m.indices,
                )
                langevin_res = langevin_res.at[slot].add(dres)

        # ---- bookkeeping + observables ----
        mol_mask = group_mask(state.typeid, l_typeid, "molecular", ghost_typeid)
        cav_mask = ~mol_mask
        ke_mol = kinetic_energy(v, state.mass, mol_mask)
        ke_cav = kinetic_energy(v, state.mass, cav_mask)

        return _finish(state, pos, image, v, forces, energies, bussi_res,
                       bussi_inst, langevin_res, mttk, clist, anchor,
                       ke_mol, ke_cav)

    return step


def run_steps(step_fn, state: MDState, n_steps: int, unroll: int = 4):
    """Scan ``n_steps`` fused steps; returns (final_state, stacked_obs).

    TPU-native details (measured v5e, N=501):

    - the obs dict is ~15 scalar leaves, and a scan emits one
      dynamic-update-slice per leaf per step — ~10 us/step of pure per-op
      overhead, 12% of the whole step. Inside the scan the same-(dtype,
      shape) leaves are packed into ONE stacked array (one update-slice
      per group); they are unpacked into the original dict right after,
      so callers see an identical pytree. The packing groups are computed
      STATICALLY from ``jax.eval_shape`` of one step (no trace-time side
      channel — a mutated-dict channel would silently desynchronize under
      retracing or ``jax.checkpoint`` wrapping).
    - the scan is unrolled 4x: at N=501 the step graph is ~60 small ops
      whose inter-op sequencing gaps plus the while-loop bookkeeping are
      ~30% of the step; unrolling amortizes both and lets XLA overlap
      across steps — 103 -> 84 us/step, saturating at unroll=4 (8 gave
      +0.5%). Physics is unchanged: unroll only regroups iterations.
    """
    # static packing plan: group obs leaves by (dtype, shape); every
    # group of >1 leaves is stacked into one scan output
    obs_sd = jax.eval_shape(step_fn, state)[1]
    leaves_sd, treedef = jax.tree_util.tree_flatten(obs_sd)
    by_sig = {}
    for i, leaf in enumerate(leaves_sd):
        by_sig.setdefault((leaf.dtype, leaf.shape), []).append(i)
    groups = [ix for ix in by_sig.values() if len(ix) > 1]
    in_group = {i for ix in groups for i in ix}
    rest_ix = [i for i in range(len(leaves_sd)) if i not in in_group]

    def body(carry, _):
        new_state, obs = step_fn(carry)
        leaves = jax.tree_util.tree_flatten(obs)[0]
        packed = [jnp.stack([leaves[i] for i in ix]) for ix in groups]
        rest = [leaves[i] for i in rest_ix]
        return new_state, (*packed, *rest)

    final, ys = jax.lax.scan(body, state, None, length=n_steps,
                             unroll=min(unroll, max(n_steps, 1)))
    packed = ys[:len(groups)]
    rest = ys[len(groups):]
    leaves_out = [None] * treedef.num_leaves
    for arr, ix in zip(packed, groups):
        for col, i in enumerate(ix):
            leaves_out[i] = arr[:, col]
    for i, leaf in zip(rest_ix, rest):
        leaves_out[i] = leaf
    return final, jax.tree_util.tree_unflatten(treedef, leaves_out)


def potential_energy(energies) -> jnp.ndarray:
    """Total PE = molecular + cavity (+ custom) components
    (analysis.py:763-812)."""
    total = (
        energies["harmonic"]
        + energies["lj"]
        + energies["ewald_short"]
        + energies["ewald_long"]
        + energies["cavity_harmonic"]
        + energies["cavity_coupling"]
        + energies["cavity_dipole_self"]
    )
    for key in energies:
        if key.startswith("custom_"):
            total = total + energies[key]
        # diagnostic flags (e.g. cell_overflow) are not energies
    return total


def universe_energy(obs) -> jnp.ndarray:
    """The conserved quantity: system (KE+PE) + all reservoir energies
    (reference analysis.py:945-958)."""
    return (
        potential_energy(obs)
        + obs["kinetic_molecular"]
        + obs["kinetic_cavity"]
        + obs["bussi_reservoir_molecular"]
        + obs["bussi_reservoir_cavity"]
        + obs["langevin_reservoir_molecular"]
        + obs["langevin_reservoir_cavity"]
    )
