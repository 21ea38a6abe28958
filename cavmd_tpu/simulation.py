"""Simulation facade: the ``hoomd.Simulation`` analog gluing state, forces,
methods, trackers and writers into a chunked scanned run.

Rebuilds the consumed HOOMD surface (SURVEY.md §2.3): create-state-from-
snapshot/GSD, momentum thermalization, an integrator with pluggable methods,
custom "actions" (trackers), periodic writers, and ``run()``. The execution
model inverts HOOMD's: instead of per-step host callbacks, the device runs
``chunk_size`` fused steps per ``lax.scan`` invocation and the host consumes
the streamed observable chunk between scans (trackers, console table, GSD
frames, runtime termination — replacing the reference's in-loop
``sys.exit(0)``, analysis.py:1256-1259).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import numpy as np

from cavmd_tpu.core.snapshot import Snapshot
from cavmd_tpu.core.units import PhysicalConstants
from cavmd_tpu.integrate.adaptive import compute_optimal_dt, make_adaptive_step
from cavmd_tpu.integrate.forcefield import ForceField
from cavmd_tpu.integrate.integrator import (
    MDState,
    MethodSpec,
    init_state,
    make_step_fn,
    resolve_methods,
    run_steps,
)
from cavmd_tpu.integrate.rng import STREAM_THERMALIZE, master_key, stream_key
from cavmd_tpu.integrate.thermostats import thermalize_velocities

# Default residency-rebuild cadence (steps) for the domain-decomposed
# slab pipeline. Measured at the N=100k production workload (v5e,
# scripts/bench_domain_s1.py sweep): cadence 20 = 12.08 ms/step vs
# 12.86 at 10 — see docs/performance.md "Multi-chip". Rebuild cadence
# does not affect the trajectory (only when re-binning happens; the
# kernel tests every candidate pair against r_cut exactly); the plan's
# post-snap drift margin (~0.34 a0 vs ~0.003 a0/step thermal drift,
# 5.7x at 20 steps) plus the per-step coverage invariant and the retry
# loop in run() keep it safe, and a coverage violation halves the
# cadence for the retry.
DOMAIN_REBUILD_EVERY = 20


class Simulation:
    """A single MD simulation on the current default JAX device."""

    def __init__(
        self,
        snapshot: Snapshot,
        forcefield: ForceField,
        methods: Sequence[MethodSpec],
        *,
        dt: float,
        seed: int = 0,
        error_tolerance: float = 0.0,
        adaptive_initial_fraction: float = 1e-3,
        adaptive_time_constant_ps: float = 50.0,
        adaptive_period: int = 1,
        extra_obs: Callable | None = None,
        chunk_size: int = 1000,
        shard_atoms: int = 0,
        rng_impl: str | None = None,
    ):
        self.snapshot = snapshot
        self.ff = forcefield
        self.methods = resolve_methods(snapshot, tuple(methods), forcefield.l_typeid)
        self.seed = seed
        self.chunk_size = chunk_size
        self.trackers: list = []
        self.writers: list = []

        # atoms-axis sharding (SURVEY.md §2.4 spatial decomposition): the
        # same fused step jitted with particle-array shardings over a
        # 1 x shard_atoms mesh; GSPMD inserts the psums (dipole, group KE,
        # PPPM grid). Snapshot N must already be padded to a multiple of
        # shard_atoms (parallel.pad_snapshot_to).
        self.mesh = None
        self._domain_plan = None
        self._domain_rebuild_every = DOMAIN_REBUILD_EVERY
        if shard_atoms > 1:
            import logging

            from cavmd_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(n_replica=1, n_atoms_shards=shard_atoms)
            # prefer the slab-decomposed pipeline for cell-mode runs: each
            # shard owns its slab's residents and the Pallas tile kernel
            # runs per shard (VERDICT r3 item 1). Adaptive dt and the
            # structured extra observables (dipole / rho(k) from
            # make_extra_obs) run INSIDE the domain step — the reference's
            # production default composes with the decomposition (VERDICT
            # r4 item 1). Remaining unsupported configs (dense mode,
            # custom forces, non-slab-able box, opaque state-based
            # extra_obs callables) fall back to GSPMD sharding, LOUDLY —
            # that path was measured 2.7-3x slower per chip.
            log = logging.getLogger(__name__)
            if forcefield.pair_mode != "cell":
                log.warning(
                    "shard_atoms=%d: domain decomposition needs "
                    "pair_mode='cell' (got %r); falling back to the "
                    "slower GSPMD atom sharding", shard_atoms,
                    forcefield.pair_mode,
                )
            elif extra_obs is not None and not (
                    hasattr(extra_obs, "dipole")
                    and hasattr(extra_obs, "wavevectors")):
                log.warning(
                    "shard_atoms=%d: extra_obs is an opaque state-based "
                    "callable (build it with observe.make_extra_obs to "
                    "keep the domain pipeline); falling back to the "
                    "slower GSPMD atom sharding", shard_atoms,
                )
            else:
                from cavmd_tpu.parallel.domain import (
                    _validate_methods,
                    plan_domain,
                )

                try:
                    _validate_methods(self.methods)
                    self._domain_plan = plan_domain(
                        snapshot, forcefield, shard_atoms
                    )
                except ValueError as e:
                    log.warning(
                        "shard_atoms=%d: domain decomposition unavailable "
                        "(%s); falling back to the slower GSPMD atom "
                        "sharding", shard_atoms, e,
                    )
            if self._domain_plan is None and snapshot.N % shard_atoms != 0:
                # only the GSPMD fallback needs an even split — the slab
                # pipeline pads its own per-shard layout
                raise ValueError(
                    f"N={snapshot.N} not divisible by shard_atoms="
                    f"{shard_atoms}; pad the snapshot first "
                    "(cavmd_tpu.parallel.pad_snapshot_to)"
                )

        self._adaptive_kwargs = dict(
            error_tolerance=error_tolerance,
            initial_fraction=adaptive_initial_fraction,
            time_constant_ps=adaptive_time_constant_ps,
            period=adaptive_period,
        )
        self._extra_obs = extra_obs
        self.state: MDState = init_state(
            snapshot, forcefield, dt=dt, seed=seed,
            error_tolerance=error_tolerance, rng_impl=rng_impl,
        )
        self._build_runner()
        if self.mesh is not None and self._domain_plan is None:
            from cavmd_tpu.parallel.shard import shard_state

            self.state = shard_state(self.state, self.mesh)
        self.error_tolerance = error_tolerance

    def _build_runner(self):
        """(Re)build the jitted chunk runner from the current ForceField —
        called at init and again after an overflow-triggered re-plan."""
        step = make_step_fn(self.ff, self.methods, extra_obs=self._extra_obs)
        if self._adaptive_kwargs["error_tolerance"] > 0:
            step = make_adaptive_step(step, **self._adaptive_kwargs)
        self._step = step
        if self.mesh is not None and self._domain_plan is not None:
            # domain-decomposed cell pipeline (parallel/domain.py): the
            # Pallas tile kernel per slab + halo ppermutes, instead of
            # GSPMD auto-sharding (which cannot partition a pallas_call
            # and all-gathers every position per step). Adaptive dt and
            # the structured extra observables run inside the sharded
            # step (one extra scalar psum / zero extra collectives).
            from cavmd_tpu.parallel.domain import make_domain_runner

            adaptive = (self._adaptive_kwargs
                        if self._adaptive_kwargs["error_tolerance"] > 0
                        else None)
            obs_spec = None
            if self._extra_obs is not None:
                obs_spec = (bool(self._extra_obs.dipole),
                            self._extra_obs.wavevectors)
            self._run_chunk = make_domain_runner(
                self.ff, self.methods, self._domain_plan, self.mesh,
                rebuild_every=self._domain_rebuild_every,
                adaptive=adaptive, obs_spec=obs_spec,
            )
        elif self.mesh is not None:
            from cavmd_tpu.parallel.mesh import state_shardings

            shardings = state_shardings(self.mesh, self.state, batched=False)
            self._run_chunk = jax.jit(
                lambda state, n: run_steps(self._step, state, n),
                static_argnums=(1,),
                in_shardings=(shardings,),
            )
        else:
            self._run_chunk = jax.jit(
                lambda state, n: run_steps(self._step, state, n),
                static_argnums=(1,),
            )

    def _grow_cell_capacity(self, *, domain_capacity_overflow: bool = False):
        """Re-plan the cell list with doubled bucket capacity (overflow
        recovery: a production engine re-plans and retries instead of
        aborting). In zcol mode the kernel's static visit window grows
        with it — its overflow shares the detection channel, and a wider
        hull is not fixed by more bucket slots alone. The caller must
        refresh any carried state.cell_list to the new shapes.

        On the domain path the runner reports the two failure modes
        separately (``domain_capacity_overflow`` = a slab/bucket exceeded
        its capacity at rebuild; otherwise the per-step drift-coverage
        invariant fired), so recovery moves only the lever that fixes the
        mode that fired: capacity overflow -> grow the plan; coverage
        violation -> halve the rebuild cadence (retries are
        deterministic, so growing capacity alone would re-fail
        identically, and a one-time bucket overflow must not permanently
        tax every later step with extra rebuilds)."""
        import dataclasses

        ncells, cap, r_cut, skin = self.ff.cell_cfg
        new_cap = max(cap + 4, cap * 2)
        updates = dict(cell_cfg=(ncells, new_cap, r_cut, skin))
        if self.ff.pair_mode == "zcol" and self.ff.zcol_W is not None:
            updates["zcol_W"] = self.ff.zcol_W + 2
        self.ff = dataclasses.replace(self.ff, **updates)
        if self._domain_plan is not None:
            if domain_capacity_overflow:
                self._domain_plan = self._domain_plan.grow_cap()
            else:
                self._domain_rebuild_every = max(
                    1, self._domain_rebuild_every // 2
                )
            new_cap = self._domain_plan.cap
        self._build_runner()
        return new_cap

    # ------------------------------------------------------------------ setup
    def thermalize(self, kT, *, molecular_only=True, photon_kT=None, seed=None):
        """Maxwell-Boltzmann momenta (reference 05_advanced_run.py:710-754):
        molecular particles via ``thermalize_particle_momenta`` semantics,
        photon velocity drawn N(0, sqrt(kT/m)) separately."""
        seed = self.seed if seed is None else seed
        key = stream_key(master_key(seed), STREAM_THERMALIZE, 0)
        typeid = np.asarray(self.state.typeid)
        l_typeid = self.ff.l_typeid

        # sharding-padding ghosts stay frozen: their 1e30 pinning mass would
        # dominate the drift-removal momentum sum
        from cavmd_tpu.integrate.integrator import group_mask

        mol_mask = group_mask(
            self.state.typeid, l_typeid,
            "molecular" if molecular_only else "all",
            self.ff.ghost_typeid,
        )
        v = thermalize_velocities(key, self.state.mass, mol_mask, kT)
        if molecular_only and l_typeid >= 0 and (typeid == l_typeid).any():
            k2 = stream_key(master_key(seed), STREAM_THERMALIZE, 1)
            pk = photon_kT if photon_kT is not None else kT
            cav_mask = self.state.typeid == l_typeid
            v_cav = thermalize_velocities(
                k2, self.state.mass, cav_mask, pk, remove_drift=False
            )
            v = v + v_cav
        self.state = self.state.replace(velocity=v)

    def set_optimal_timestep(self, tolerance: float):
        """Bootstrap dt from current forces (05_advanced_run.py:756-819)."""
        new_dt = compute_optimal_dt(self.state.forces, self.state.mass, tolerance)
        self.state = self.state.replace(dt=new_dt)
        return float(new_dt)

    # -------------------------------------------------------------------- run
    def run(self, *, n_steps: int | None = None, runtime_ps: float | None = None,
            profile_dir: str | None = None):
        """Run until ``n_steps`` or ``runtime_ps`` (whichever given).

        Observables stream to trackers/writers once per chunk.
        ``profile_dir``: capture a ``jax.profiler`` trace of the run
        (the tracing/observability subsystem — SURVEY.md §5; view with
        TensorBoard or Perfetto).
        """
        if n_steps is None and runtime_ps is None:
            raise ValueError("give n_steps or runtime_ps")
        if profile_dir is not None:
            with jax.profiler.trace(profile_dir):
                return self.run(n_steps=n_steps, runtime_ps=runtime_ps)
        steps_done = 0
        while True:
            if n_steps is not None:
                remaining = n_steps - steps_done
                if remaining <= 0:
                    break
                chunk = min(self.chunk_size, remaining)
            else:
                # Trim the final chunk so the run stops within one step of
                # runtime_ps (the reference stops exactly,
                # analysis.py:1256-1259). Estimate remaining steps from the
                # current dt; with adaptive dt the estimate is refreshed
                # every chunk, so any residual is cleaned up by a short
                # follow-up chunk.
                remaining_ps = runtime_ps - (
                    float(self.state.time_au)
                    * PhysicalConstants.TIME_PS_CONVERSION
                )
                if remaining_ps <= 0:
                    break
                dt_ps = float(self.state.dt) * PhysicalConstants.TIME_PS_CONVERSION
                est = int(np.ceil(remaining_ps / max(dt_ps, 1e-30)))
                chunk = min(self.chunk_size, max(1, est))
            pre_chunk_state = self.state
            retries = 0
            while True:
                self.state, obs = self._run_chunk(self.state, chunk)
                obs_np = {k: np.asarray(v) for k, v in obs.items()}
                if not ("cell_overflow" in obs_np
                        and obs_np["cell_overflow"].any()):
                    break
                # overflow recovery: results from this chunk dropped pairs —
                # re-plan with a doubled bucket capacity and retry the chunk
                # from its starting state (up to 4 doublings = 16x capacity)
                retries += 1
                if retries > 4:
                    if self._domain_plan is not None:
                        raise RuntimeError(
                            "domain-pipeline overflow persists after 4 "
                            "re-plans (slab cap nb_cap="
                            f"{self._domain_plan.nb_cap}, bucket cap="
                            f"{self._domain_plan.cap}, rebuild_every="
                            f"{self._domain_rebuild_every}) — system "
                            "density is collapsing or the configuration "
                            "is pathological"
                        )
                    raise RuntimeError(
                        "cell-list bucket overflow persists after 4 "
                        "capacity doublings — system density is collapsing "
                        "or the configuration is pathological"
                    )
                cap_flag = obs_np.get("domain_capacity_overflow")
                new_cap = self._grow_cell_capacity(
                    domain_capacity_overflow=bool(
                        cap_flag is not None and cap_flag.any()
                    ),
                )
                import logging

                logging.getLogger(__name__).warning(
                    "cell-list overflow: re-planned with cap=%d "
                    "(rebuild_every=%d), retrying chunk", new_cap,
                    self._domain_rebuild_every,
                )
                self.state = pre_chunk_state.replace(
                    cell_list=(
                        jax.jit(self.ff.build_cells)(
                            pre_chunk_state.position, pre_chunk_state.box_L
                        )
                        if pre_chunk_state.cell_list is not None else None
                    ),
                    cell_anchor=(
                        pre_chunk_state.position
                        if pre_chunk_state.cell_list is not None else None
                    ),
                )
            for tracker in self.trackers:
                tracker.consume(obs_np)
            for writer in self.writers:
                writer.consume(obs_np, self)
            steps_done += chunk
            if runtime_ps is not None:
                if float(obs_np["time_au"][-1]) * PhysicalConstants.TIME_PS_CONVERSION >= runtime_ps:
                    break
        return steps_done

    # ------------------------------------------------------------------ state
    @property
    def timestep(self) -> int:
        return int(self.state.timestep)

    @property
    def elapsed_ps(self) -> float:
        return float(self.state.time_au) * PhysicalConstants.TIME_PS_CONVERSION

    def get_snapshot(self, *, strip_ghosts: bool = True) -> Snapshot:
        """Export the current state as a Snapshot (GSD-compatible).

        Sharding-padding ghost rows are dropped by default so trajectory
        files contain only physical particles (padding is re-applied on
        resume by the driver). Ghosts are appended after all real rows by
        ``pad_snapshot_to``, so bond indices stay valid under the slice.
        """
        s = self.state
        snap = self.snapshot.replace(
            position=s.position, image=s.image, velocity=s.velocity,
        )
        gid = self.ff.ghost_typeid
        if strip_ghosts and gid >= 0:
            snap = snap.strip_tail(int(np.sum(np.asarray(snap.typeid) != gid)))
        return snap
