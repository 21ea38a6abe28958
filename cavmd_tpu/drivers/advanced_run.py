"""Advanced cavity-MD experiment runner — the TPU-native rebuild of the
reference's canonical driver (``examples/05_advanced_run.py``, 1634 LoC).

Reproduces the 7-phase workflow (reference lines 282-337), the ~25-flag CLI
(1443-1521), SLURM array-job replica fan-out (1326-1334), the
``cavity_coupling_{g}`` / ``no_cavity`` directory layout (1366-1374), and
the output-file inventory (energy tracker, cavity mode, F(k,t) references,
GSD trajectory, console table). Differences, by design:

- If the input GSD is missing (``examples/init-0.gsd`` is absent from the
  reference mirror), an equivalent O2/N2 diatomic system is generated,
  FIRE-minimized, and written to the requested path — making the driver
  self-contained.
- Run-length control is the chunked runner polling elapsed time, not an
  in-loop ``sys.exit(0)`` (analysis.py:1256-1259).
- ``--replicas`` can run sequentially (reference behavior) or batched on
  one chip via ``--vmap-replicas`` (vmap over a replica axis; SURVEY.md
  §2.4 replica-parallelism).

Usage (flag parity with the reference):
    python -m cavmd_tpu.drivers.advanced_run --molecular-bath bussi \
        --cavity-bath langevin --coupling 1e-3 --runtime 1000
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time
from pathlib import Path

import numpy as np


def setup_backend(device: str):
    """Select the JAX backend. 'CPU' forces the host platform; 'TPU'/'GPU'
    uses the default accelerator (parity role: setup_device,
    05_advanced_run.py:428-451)."""
    import jax

    if device.upper() == "CPU":
        jax.config.update("jax_platforms", "cpu")
    return jax.devices()[0]


class CavityMDSimulation:
    """Encapsulates setup and execution of one cavity MD experiment
    (parity: reference CavityMDSimulation, 05_advanced_run.py:145-1324)."""

    def __init__(
        self, job_dir, replica, freq, couplstr, incavity, runtime_ps=500.0,
        input_gsd="molecular-0.gsd", frame=-1, name="prod", error_tolerance=0.01,
        temperature=100.0, molecular_thermostat="bussi", cavity_thermostat="langevin",
        cavity_damping_factor=1.0, add_cavity_particle=True, finite_q=False,
        molecular_thermostat_tau=5.0, cavity_thermostat_tau=5.0,
        log_level="INFO", enable_fkt=True, fkt_kmag=1.0, fkt_num_wavevectors=50,
        fkt_reference_interval_ps=1.0, fkt_max_references=10,
        max_energy_output_time_ps=None, enable_energy_tracking=False,
        dt_fs=None, device="CPU",
        energy_output_period_ps=0.1, fkt_output_period_ps=1.0,
        gsd_output_period_ps=50.0, console_output_period_ps=1.0,
        truncate_gsd=False, seed=None, n_molecules=250, box_L=46.0,
        chunk_size=500, precision="f64", shard_atoms=0, pad_atoms=0,
        pppm_resolution=32, rng_impl=None,
    ):
        self.job_dir = job_dir
        self.replica = replica
        self.freq = freq
        self.couplstr = couplstr
        self.incavity = incavity
        self.runtime_ps = runtime_ps
        self.input_gsd = input_gsd
        self.frame = frame
        self.name = name
        self.error_tolerance = error_tolerance
        self.temperature = temperature
        self.molecular_thermostat = molecular_thermostat
        self.cavity_thermostat = cavity_thermostat
        self.cavity_damping_factor = cavity_damping_factor
        self.add_cavity_particle = add_cavity_particle
        self.finite_q = finite_q
        self.molecular_thermostat_tau = molecular_thermostat_tau
        self.cavity_thermostat_tau = cavity_thermostat_tau
        self.log_level = log_level
        self.enable_fkt = enable_fkt
        self.fkt_kmag = fkt_kmag
        self.fkt_num_wavevectors = fkt_num_wavevectors
        self.fkt_reference_interval_ps = fkt_reference_interval_ps
        self.fkt_max_references = fkt_max_references
        self.max_energy_output_time_ps = max_energy_output_time_ps
        self.enable_energy_tracking = enable_energy_tracking
        self.dt_fs = dt_fs
        self.device = device
        self.energy_output_period_ps = energy_output_period_ps
        self.fkt_output_period_ps = fkt_output_period_ps
        self.gsd_output_period_ps = gsd_output_period_ps
        self.console_output_period_ps = console_output_period_ps
        self.truncate_gsd = truncate_gsd
        self.seed = seed if seed is not None else np.random.randint(10**4)
        self.n_molecules = n_molecules
        self.box_L = box_L
        self.chunk_size = chunk_size
        self.precision = precision
        self.shard_atoms = shard_atoms
        self.pad_atoms = pad_atoms
        self.pppm_resolution = pppm_resolution
        self.rng_impl = rng_impl
        self.logger = None
        self.sim = None

    # ------------------------------------------------------------- logging
    def setup_logging(self):
        logger_name = f"CavityMD_{self.name}_{self.replica}"
        self.logger = logging.getLogger(logger_name)
        self.logger.setLevel(getattr(logging, self.log_level.upper()))
        self.logger.handlers.clear()
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(
            logging.Formatter("%(asctime)s | %(levelname)s | %(message)s",
                              datefmt="%Y-%m-%d %H:%M:%S")
        )
        self.logger.addHandler(h)
        self.log_info("=" * 60)
        self.log_info("CAVITY MD SIMULATION STARTED (cavmd_tpu)")
        self.log_info("=" * 60)
        self.log_info(f"Simulation: {self.name}-{self.replica}")
        self.log_info(f"Device: {self.device}")
        self.log_info(f"Runtime: {self.runtime_ps} ps")
        self.log_info(f"Temperature: {self.temperature} K")
        self.log_info(
            f"Cavity coupling: {'Enabled' if self.incavity else 'Disabled'}"
        )
        if self.incavity:
            self.log_info(f"  Frequency: {self.freq} cm^-1")
            self.log_info(f"  Coupling strength: {self.couplstr}")
            self.log_info(f"  Finite-q mode: {self.finite_q}")

    def log_info(self, msg):
        (self.logger.info if self.logger else print)(msg)

    def log_error(self, msg):
        (self.logger.error if self.logger else print)(msg)

    # ---------------------------------------------------------------- phases
    def run(self):
        """Orchestrate the full 7-phase workflow; returns 0 on success."""
        try:
            self.setup_logging()
            self.log_info("=== Phase 1: Setting up simulation ===")
            self._setup_state()
            self.log_info("=== Phase 2: Configuring forces and thermostats ===")
            self._setup_forces_and_methods()
            self.log_info("=== Phase 3: Integrator + thermalization ===")
            self._setup_simulation()
            self.log_info("=== Phase 3.5: Computing optimal timestep ===")
            self._set_timestep()
            self.log_info("=== Phase 4: Trackers and loggers ===")
            self._setup_trackers()
            self.log_info("=== Phase 5: Output writers ===")
            self._setup_writers()
            self.log_info("=== Phase 6: Running simulation ===")
            t0 = time.time()
            steps = self.sim.run(runtime_ps=self.runtime_ps)
            wall = time.time() - t0
            self.log_info(
                f"Completed {steps} steps, {self.sim.elapsed_ps:.3f} ps in "
                f"{wall:.1f} s ({steps / max(wall, 1e-9):.1f} steps/s)"
            )
            self.log_info("=== Phase 7: Cleanup ===")
            self._cleanup()
            self.log_info("=== SIMULATION COMPLETED SUCCESSFULLY ===")
            return 0
        except Exception as e:  # noqa: BLE001 — parity with reference
            self.log_error(f"CRITICAL ERROR in simulation: {e}")
            import traceback

            for line in traceback.format_exc().split("\n"):
                if line.strip():
                    self.log_error(line)
            return 1
        finally:
            # always restore the working directory — a failed replica must
            # not strand subsequent replicas inside its job_dir
            if hasattr(self, "original_cwd"):
                os.chdir(self.original_cwd)

    def _setup_state(self):
        import jax

        setup_backend(self.device)
        if self.precision == "auto":
            self.precision = "f64" if self.device.upper() == "CPU" else "f32"
        if self.precision == "f64":
            jax.config.update("jax_enable_x64", True)
        self.dtype = np.float64 if self.precision == "f64" else np.float32

        from cavmd_tpu.core.snapshot import add_cavity_particle as inject
        from cavmd_tpu.core.system import make_diatomic_system
        from cavmd_tpu.io import open_gsd

        self.original_cwd = os.getcwd()
        os.makedirs(self.job_dir, exist_ok=True)
        os.chdir(self.job_dir)

        if os.path.exists(self.input_gsd):
            with open_gsd(self.input_gsd) as t:
                frame = self.frame if self.frame >= 0 else max(len(t) + self.frame, 0)
                if frame >= len(t):
                    # replica number doubles as the frame index (reference
                    # 05_advanced_run.py:1571); clamp for short input files
                    self.log_info(
                        f"Frame {frame} beyond {len(t)}-frame input; using last"
                    )
                    frame = len(t) - 1
                snap = t.read_frame(frame, dtype=self.dtype)
            self.log_info(
                f"State read from {self.input_gsd} frame {frame} (N={snap.N})"
            )
        else:
            self.log_info(
                f"Input GSD {self.input_gsd} not found — generating equivalent "
                f"O2/N2 system ({self.n_molecules} molecules) and minimizing"
            )
            snap = make_diatomic_system(
                self.n_molecules, box_L=self.box_L, seed=self.seed,
                dtype=self.dtype,
            )
            from cavmd_tpu.integrate import ForceField
            from cavmd_tpu.utils import fire_minimize

            ff0 = ForceField.create(snap, enable_cavity=False)
            snap = fire_minimize(snap, ff0, n_steps=300)
            from cavmd_tpu.io import HOOMDTrajectory

            with HOOMDTrajectory(self.input_gsd, "w") as t:
                t.append(snap, step=0, dtype=self.dtype)

        if self.incavity and self.add_cavity_particle and "L" not in snap.types:
            snap = inject(
                snap, coupling=self.couplstr, freq_cm1=self.freq,
                temperature_K=self.temperature, finite_q=self.finite_q,
                seed=self.seed + 1,
            )
            self.log_info("Cavity particle added to system")
        elif self.incavity and "L" in snap.types:
            n_cav = int(np.sum(np.asarray(snap.typeid) == snap.type_index("L")))
            if n_cav != 1:
                raise ValueError(
                    f"Expected exactly 1 cavity particle but found {n_cav}"
                )
        # atoms-axis sharded production (VERDICT r1 item 3): pad N to the
        # shard multiple with inert ghosts, then shard the state over a
        # 1 x shard_atoms device mesh. --pad-atoms pads WITHOUT sharding
        # (RNG draws are N-shaped, so a padded single-device run is the
        # bitwise comparator for a sharded one).
        pad_mult = max(self.shard_atoms, self.pad_atoms)
        if pad_mult > 1:
            from cavmd_tpu.parallel import pad_snapshot_to

            snap, pad = pad_snapshot_to(snap, pad_mult)
            if pad:
                self.log_info(
                    f"Padded {pad} ghost particles (N={snap.N}) for "
                    f"{pad_mult}-way atom sharding"
                )
        self.snapshot = snap

    def _setup_forces_and_methods(self):
        from cavmd_tpu.core.units import PhysicalConstants as PC
        from cavmd_tpu.integrate import ForceField, MethodSpec

        self.ff = ForceField.create(
            self.snapshot, coupling=self.couplstr, freq_cm1=self.freq,
            enable_cavity=self.incavity,
            pppm_mesh=(self.pppm_resolution,) * 3,
        )

        kT = PC.kT_from_kelvin(self.temperature)
        self.kT = kT
        methods = []
        mt = self.molecular_thermostat.lower()
        if mt == "bussi":
            methods.append(MethodSpec(
                kind="bussi", group="molecular", kT=kT,
                tau=PC.ps_to_atomic_units(self.molecular_thermostat_tau),
            ))
            self.log_info("Molecular bath: Bussi (NVT)")
        elif mt == "langevin":
            methods.append(MethodSpec(
                kind="langevin", group="molecular", kT=kT,
                gamma=PC.gamma_from_tau_ps(self.molecular_thermostat_tau),
            ))
            self.log_info("Molecular bath: Langevin (NVT)")
        elif mt == "brownian":
            methods.append(MethodSpec(
                kind="brownian", group="molecular", kT=kT,
                gamma=PC.gamma_from_tau_ps(self.molecular_thermostat_tau),
            ))
            self.log_info("Molecular bath: Brownian (overdamped)")
        elif mt == "none":
            methods.append(MethodSpec(kind="nve", group="molecular"))
            self.log_info("Molecular bath: none (NVE)")
        else:
            raise ValueError(f"Invalid molecular_thermostat: {mt}")

        if self.incavity:
            ct = self.cavity_thermostat.lower()
            if ct == "langevin":
                gamma = self.cavity_damping_factor * PC.gamma_from_tau_ps(
                    self.cavity_thermostat_tau
                )
                methods.append(MethodSpec(
                    kind="langevin", group="cavity", kT=kT, gamma=gamma,
                ))
                self.log_info("Cavity bath: Langevin")
            elif ct == "bussi":
                methods.append(MethodSpec(
                    kind="bussi", group="cavity", kT=kT,
                    tau=PC.ps_to_atomic_units(self.cavity_thermostat_tau),
                ))
                self.log_info("Cavity bath: Bussi")
            elif ct == "brownian":
                gamma = self.cavity_damping_factor * PC.gamma_from_tau_ps(
                    self.cavity_thermostat_tau
                )
                methods.append(MethodSpec(
                    kind="brownian", group="cavity", kT=kT, gamma=gamma,
                ))
                self.log_info("Cavity bath: Brownian (overdamped)")
            elif ct == "none":
                methods.append(MethodSpec(kind="nve", group="cavity"))
                self.log_info("Cavity bath: none (NVE)")
            else:
                raise ValueError(f"Invalid cavity_thermostat: {ct}")
        self.methods = methods

    def _setup_simulation(self):
        from cavmd_tpu.core.units import PhysicalConstants as PC
        from cavmd_tpu.observe import generate_fibonacci_sphere, make_extra_obs
        from cavmd_tpu.simulation import Simulation

        extra = None
        if self.enable_fkt:
            wv = generate_fibonacci_sphere(self.fkt_num_wavevectors) * self.fkt_kmag
            extra = make_extra_obs(dipole=True, wavevectors=wv)

        dt0 = PC.fs_to_atomic_units(self.dt_fs if self.dt_fs else 0.1)
        # adaptive updates fire on the energy period (reference attaches
        # AdaptiveTimestepUpdater with trigger Periodic(energy_period),
        # 05_advanced_run.py:851-855), not every step
        adaptive_period = max(1, int(self.energy_output_period_ps / 0.0001))
        self.sim = Simulation(
            self.snapshot, self.ff, self.methods,
            dt=dt0, seed=self.seed,
            error_tolerance=self.error_tolerance,
            adaptive_period=min(adaptive_period, self.chunk_size),
            chunk_size=self.chunk_size,
            extra_obs=extra,
            shard_atoms=self.shard_atoms,
            rng_impl=self.rng_impl,
        )
        if self.shard_atoms > 1:
            if self.sim._domain_plan is not None:
                self.log_info(
                    f"Sharded production: domain pipeline "
                    f"({self.shard_atoms} slabs via shard_map + halo "
                    f"exchange)"
                )
            else:
                self.log_info(
                    f"Sharded production: GSPMD particle-array sharding "
                    f"over {self.shard_atoms} devices (domain pipeline "
                    f"unavailable for this config — see warning above)"
                )
        self.sim.thermalize(self.kT)
        self.log_info("Thermalized molecular momenta (+ photon velocity)")

    def _set_timestep(self):
        from cavmd_tpu.core.units import PhysicalConstants as PC

        if self.error_tolerance <= 0:
            if self.dt_fs is not None:
                self.log_info(f"Fixed timestep: {self.dt_fs} fs")
            return
        dt = self.sim.set_optimal_timestep(self.error_tolerance * 1e-3)
        self.log_info(
            f"Optimal initial dt = {dt:.6f} a.u. "
            f"({PC.atomic_units_to_ps(dt) * 1000:.4f} fs)"
        )

    def _setup_trackers(self):
        from cavmd_tpu.observe import (
            CavityModeTracker,
            DipoleAutocorrelation,
            ElapsedTimeTracker,
            EnergyTracker,
            FieldAutocorrelationTracker,
            PerformanceTracker,
            TimestepFormatter,
        )

        prefix = f"{self.name}-{self.replica}"
        self.time_tracker = ElapsedTimeTracker(self.runtime_ps)
        self.perf_tracker = PerformanceTracker(self.runtime_ps)
        self.dt_formatter = TimestepFormatter()
        self.sim.trackers += [self.time_tracker, self.perf_tracker, self.dt_formatter]

        # step-period throttles computed from the nominal dt (parity:
        # calculate_physical_parameters, 05_advanced_run.py:339-386)
        dt_ps_nominal = 0.0001 if self.error_tolerance > 0 else (
            (self.dt_fs or 1.0) / 1000.0
        )
        energy_period = max(1, int(self.energy_output_period_ps / dt_ps_nominal))
        fkt_period = max(1, int(self.fkt_output_period_ps / dt_ps_nominal))

        if self.enable_energy_tracking:
            tid = np.asarray(self.snapshot.typeid)
            real_mol = tid != self.ff.l_typeid
            if self.ff.ghost_typeid >= 0:
                real_mol &= tid != self.ff.ghost_typeid
            n_dof = 3 * int(np.sum(real_mol))
            self.sim.trackers.append(EnergyTracker(
                output_prefix=prefix,
                output_period_steps=energy_period,
                max_time_ps=self.max_energy_output_time_ps,
                n_molecular_dof=n_dof,
            ))
            if self.incavity:
                self.sim.trackers.append(CavityModeTracker(
                    output_prefix=prefix, output_period_steps=energy_period,
                ))
            self.log_info("Energy tracking enabled")
        if self.enable_fkt:
            self.sim.trackers.append(FieldAutocorrelationTracker(
                output_prefix=prefix,
                output_period_steps=fkt_period,
                reference_interval_ps=self.fkt_reference_interval_ps,
                max_references=self.fkt_max_references,
            ))
            self.sim.trackers.append(
                DipoleAutocorrelation(output_period_steps=fkt_period)
            )
            self.log_info(
                f"F(k,t) enabled: k={self.fkt_kmag}, "
                f"{self.fkt_num_wavevectors} wavevectors"
            )

    def _setup_writers(self):
        from cavmd_tpu.io import GSDWriter, TableWriter

        prefix = f"{self.name}-{self.replica}"
        self.gsd_writer = GSDWriter(
            f"{prefix}.gsd", output_period_ps=self.gsd_output_period_ps,
            truncate=self.truncate_gsd,
        )
        self.gsd_writer.write_now(self.sim)  # initial frame
        self.sim.writers.append(self.gsd_writer)
        self.sim.writers.append(
            TableWriter(self.perf_tracker,
                        output_period_ps=self.console_output_period_ps)
        )
        self.log_info(f"GSD writer: {prefix}.gsd "
                      f"(every {self.gsd_output_period_ps} ps)")

    def _cleanup(self):
        if hasattr(self, "gsd_writer"):
            self.gsd_writer.close()


# ---------------------------------------------------------------- replicas
def get_slurm_info():
    """SLURM array-task detection (parity: 05_advanced_run.py:1326-1334)."""
    task_id = os.environ.get("SLURM_ARRAY_TASK_ID")
    job_id = os.environ.get("SLURM_JOB_ID", "unknown")
    return (int(task_id) if task_id is not None else None), job_id


def parse_replicas(replicas_str):
    """Parse '1-5' / '1,3,5' specs (parity: 05_advanced_run.py:1336-1351)."""
    if not replicas_str:
        return [1]
    replicas = []
    for part in replicas_str.split(","):
        part = part.strip()
        if "-" in part:
            start, end = part.split("-", 1)
            replicas.extend(range(int(start), int(end) + 1))
        else:
            replicas.append(int(part))
    return sorted(set(replicas))


def run_vmapped_replicas(args, replica_list):
    """Batch all replicas into one vmapped program, optionally sharded over
    a (replica x atoms) device mesh (SURVEY.md §2.4 replica parallelism;
    BASELINE config 'Replica batch --replicas 1-8 vmapped on one chip').

    Runs the COMPLETE per-replica workflow of the sequential path
    (reference 05_advanced_run.py:1353-1439): per-replica initial frames
    from ``--input-gsd`` (replica number doubles as the frame index,
    reference 1571), adaptive dt with per-replica optimal-dt bootstrap,
    energy + cavity-mode trackers, F(k,t) and dipole autocorrelation,
    periodic per-replica GSD frames with embedded ``log/*`` chunks,
    cell-overflow recovery, and per-replica runtime termination (a fast
    replica's outputs stop at ``--runtime`` even while the batch advances
    the slower ones). ``--shard-replicas R`` distributes the replica axis
    over R devices (composable with ``--shard-atoms``) — the TPU-native
    answer to the reference's SLURM-array scale-out (submit.sh:4).
    """
    import dataclasses

    import jax

    setup_backend(args.device)
    precision = args.precision
    if precision == "auto":
        precision = "f64" if args.device.upper() == "CPU" else "f32"
    if precision == "f64":
        jax.config.update("jax_enable_x64", True)
    import numpy as np

    from cavmd_tpu.core.snapshot import add_cavity_particle as inject
    from cavmd_tpu.core.system import make_diatomic_system
    from cavmd_tpu.core.units import PhysicalConstants as PC
    from cavmd_tpu.integrate import (
        ForceField, make_step_fn, resolve_methods,
    )
    from cavmd_tpu.integrate.adaptive import (
        compute_optimal_dt, make_adaptive_step,
    )
    from cavmd_tpu.integrate.integrator import run_steps
    from cavmd_tpu.io import HOOMDTrajectory, open_gsd
    from cavmd_tpu.io.gsd import gather_tracker_log
    from cavmd_tpu.observe import (
        CavityModeTracker,
        DipoleAutocorrelation,
        EnergyTracker,
        FieldAutocorrelationTracker,
        generate_fibonacci_sphere,
        make_extra_obs,
    )
    from cavmd_tpu.parallel import (
        init_replica_states,
        make_mesh,
        make_replica_step,
        make_sharded_runner,
        pad_snapshot_to,
        shard_state,
        split_replica_obs,
    )
    from cavmd_tpu.utils import fire_minimize

    incavity = not args.no_cavity
    coupling_str = f"{args.coupling:.0e}".replace("-", "neg").replace("+", "pos")
    exp_dir = Path(f"cavity_coupling_{coupling_str}" if incavity else "no_cavity")
    exp_dir.mkdir(exist_ok=True)
    cwd = os.getcwd()
    os.chdir(exp_dir)
    try:
        dtype = np.float64 if precision == "f64" else np.float32
        # per-replica initial frames: replica number doubles as the input
        # frame index (reference 05_advanced_run.py:1571), clamped for
        # short files — same convention as the sequential path
        if os.path.exists(args.input_gsd):
            with open_gsd(args.input_gsd) as t:
                nf = len(t)
                snaps = []
                for r in replica_list:
                    fr = r if 0 <= r < nf else nf - 1
                    snaps.append(t.read_frame(fr, dtype=dtype))
            print(f"Replica frames seeded from {args.input_gsd} "
                  f"({nf} frames, N={snaps[0].N})")
        else:
            snap0 = make_diatomic_system(
                args.n_molecules, box_L=resolved_box(args), seed=args.seed,
                dtype=dtype,
            )
            ff0 = ForceField.create(snap0, enable_cavity=False)
            snap0 = fire_minimize(snap0, ff0, n_steps=300)
            snaps = [snap0] * len(replica_list)
        if incavity:
            snaps = [
                inject(
                    s, coupling=args.coupling, freq_cm1=args.frequency,
                    temperature_K=args.temperature, finite_q=args.finite_q,
                    seed=args.seed + r + 1,
                ) if "L" not in s.types else s
                for r, s in zip(replica_list, snaps)
            ]
        # --pad-atoms pads WITHOUT sharding: the single-device comparator
        # for sharded runs (RNG draws are N-shaped)
        pad_mult = max(args.shard_atoms, args.pad_atoms)
        if pad_mult > 1:
            snaps = [pad_snapshot_to(s, pad_mult)[0] for s in snaps]
        snap = snaps[0]
        ff = ForceField.create(
            snap, coupling=args.coupling, freq_cm1=args.frequency,
            enable_cavity=incavity,
            pppm_mesh=(args.pppm_resolution,) * 3,
        )
        kT = PC.kT_from_kelvin(args.temperature)
        methods = [_method_spec(args.molecular_bath, "molecular", kT,
                                args.molecular_tau)]
        if incavity:
            methods.append(_method_spec(args.cavity_bath, "cavity", kT,
                                        args.cavity_tau,
                                        args))
        methods = resolve_methods(snap, tuple(methods), ff.l_typeid)

        extra = None
        if args.enable_fkt:
            wv = generate_fibonacci_sphere(args.fkt_wavevectors) * args.fkt_kmag
            extra = make_extra_obs(dipole=True, wavevectors=wv)

        # adaptive dt inside the vmapped scan (each replica carries its own
        # dt/tolerance ramp), parity with the sequential path
        error_tolerance = 0.0 if args.fixed_timestep else 1.0
        dt_ps_nominal = 0.0001 if error_tolerance > 0 else args.timestep / 1000.0
        chunk = 500

        def build_step(ff_):
            s = make_step_fn(ff_, methods, extra_obs=extra)
            if error_tolerance > 0:
                adaptive_period = max(1, int(
                    args.energy_output_period_ps / dt_ps_nominal
                ))
                s = make_adaptive_step(
                    s, error_tolerance=error_tolerance,
                    period=min(adaptive_period, chunk),
                )
            return s

        n_rep = len(replica_list)
        # replica-axis (x atoms-axis) device mesh: the reference's only
        # scale-out is SLURM replicas across nodes (submit.sh:4); here the
        # replica batch axis shards over devices with zero cross-replica
        # communication (and atoms-axis psums within each replica shard)
        mesh = None
        if args.shard_replicas > 1 or args.shard_atoms > 1:
            n_r = max(args.shard_replicas, 1)
            n_a = max(args.shard_atoms, 1)
            devs = jax.devices()
            if n_r * n_a > len(devs):
                raise ValueError(
                    f"mesh {n_r}x{n_a} needs {n_r * n_a} devices, "
                    f"have {len(devs)}"
                )
            if n_rep % n_r != 0:
                raise ValueError(
                    f"{n_rep} replicas not divisible by "
                    f"--shard-replicas {n_r}"
                )
            mesh = make_mesh(n_replica=n_r, n_atoms_shards=n_a,
                             devices=devs[: n_r * n_a])
            print(f"Sharded replica production: mesh {n_r}x{n_a} "
                  f"(replica x atoms)")

        def build_runner(step_, template):
            vstep = make_replica_step(step_)
            if mesh is None:
                return jax.jit(
                    lambda s, n: run_steps(vstep, s, n), static_argnums=(1,)
                )
            return make_sharded_runner(vstep, mesh, template, batched=True)

        step = build_step(ff)
        dt = PC.fs_to_atomic_units(args.timestep if args.fixed_timestep else 0.1)
        batched = init_replica_states(
            snaps, ff, dt=dt, seed=args.seed, kT=kT,
            error_tolerance=error_tolerance,
        )
        if error_tolerance > 0:
            # per-replica optimal-dt bootstrap (reference Phase 3.5,
            # 05_advanced_run.py:756-819) from each replica's initial forces
            tol0 = error_tolerance * 1e-3
            dts = jax.vmap(
                lambda f, m: compute_optimal_dt(f, m, tol0)
            )(batched.forces, batched.mass)
            batched = batched.replace(dt=dts.astype(batched.dt.dtype))

        tid = np.asarray(snap.typeid)
        real_mol = tid != ff.l_typeid
        if ff.ghost_typeid >= 0:
            real_mol &= tid != ff.ghost_typeid
        n_dof = 3 * int(np.sum(real_mol))
        energy_period = max(1, int(args.energy_output_period_ps / dt_ps_nominal))
        fkt_period = max(1, int(args.fkt_output_period_ps / dt_ps_nominal))
        trackers = []  # list of per-replica tracker lists
        for r in replica_list:
            per_rep = [EnergyTracker(
                output_prefix=f"prod-{r}",
                output_period_steps=energy_period, n_molecular_dof=n_dof,
            )]
            if incavity:
                per_rep.append(CavityModeTracker(
                    output_prefix=f"prod-{r}",
                    output_period_steps=energy_period,
                ))
            if args.enable_fkt:
                per_rep.append(FieldAutocorrelationTracker(
                    output_prefix=f"prod-{r}",
                    output_period_steps=fkt_period,
                    reference_interval_ps=args.fkt_ref_interval,
                    max_references=args.fkt_max_refs,
                ))
                per_rep.append(DipoleAutocorrelation(
                    output_prefix=f"prod-{r}_dipole_autocorr",
                    output_period_steps=fkt_period,
                ))
            trackers.append(per_rep)

        # per-replica periodic trajectory writers (not just final frames),
        # embedding log/* chunks per frame — parity with the sequential
        # GSDWriter and the reference logger (05_advanced_run.py:1231-1249)
        gsd_files = [HOOMDTrajectory(f"prod-{r}.gsd", "w")
                     for r in replica_list]
        last_gsd_ps = np.full(n_rep, -1e30)
        # replicas that crossed --runtime: their final frame is written at
        # the crossing chunk boundary (chunks are trimmed to the earliest
        # crossing, so the overshoot is <= 1 step) and their trackers and
        # writers go quiet while the batch advances the slower clocks —
        # matching the sequential path's exact-runtime termination
        finished = np.zeros(n_rep, dtype=bool)
        n_real = int(np.sum(tid != ff.ghost_typeid)) if ff.ghost_typeid >= 0 \
            else snap.N

        def write_frames(batched_state):
            pos = np.asarray(batched_state.position)
            img = np.asarray(batched_state.image)
            vel = np.asarray(batched_state.velocity)
            ts = np.asarray(batched_state.timestep)
            dts = np.asarray(batched_state.dt)
            el = np.asarray(batched_state.time_au) * PC.TIME_PS_CONVERSION
            for k in range(n_rep):
                if finished[k]:
                    continue
                crossing = el[k] >= args.runtime and ts[k] > 0
                if crossing or (
                    el[k] - last_gsd_ps[k] >= args.gsd_output_period_ps
                ):
                    # sharding-padding ghost rows are appended after all
                    # real rows (pad_snapshot_to) — strip them from frames
                    frame_snap = snaps[k] if ff.ghost_typeid < 0 else (
                        snaps[k].strip_tail(n_real))
                    gsd_files[k].append(
                        frame_snap.replace(
                            position=pos[k][:n_real], image=img[k][:n_real],
                            velocity=vel[k][:n_real]),
                        step=int(ts[k]),
                        log_data=gather_tracker_log(
                            trackers[k], el[k], dts[k]),
                    )
                    last_gsd_ps[k] = el[k]
                if crossing:
                    finished[k] = True

        write_frames(batched)  # initial frames

        runner = build_runner(step, batched)
        if mesh is not None:
            batched = shard_state(batched, mesh, batched=True)
        t0 = time.time()
        while True:
            elapsed = np.asarray(batched.time_au) * PC.TIME_PS_CONVERSION
            remaining = args.runtime - elapsed
            if (remaining <= 0).all():
                break
            # trim the chunk to (a) the slowest-clock unfinished replica so
            # no replica overshoots runtime_ps by more than ~1 step, and
            # (b) the next due GSD frame — frame cadence is only checked at
            # chunk boundaries, so a whole runtime fitting in one chunk
            # would otherwise skip every periodic frame (adaptive dt ramps
            # can make the step estimate span the full run)
            dt_ps = np.asarray(batched.dt) * PC.TIME_PS_CONVERSION
            live = remaining > 0
            safe_dt = np.maximum(dt_ps[live], 1e-30)
            est = int(np.ceil((remaining[live] / safe_dt).min()))
            till_gsd = np.maximum(
                (last_gsd_ps + args.gsd_output_period_ps - elapsed)[live],
                0.0,
            )
            est_gsd = int(np.ceil((till_gsd / safe_dt).min()))
            n_next = min(chunk, max(1, est), max(1, est_gsd))
            pre_chunk = batched
            retries = 0
            while True:
                batched, obs = runner(pre_chunk, n_next)
                obs_np = {k: np.asarray(v) for k, v in obs.items()}
                if not ("cell_overflow" in obs_np
                        and obs_np["cell_overflow"].any()):
                    break
                # overflow recovery (parity with Simulation.run): this
                # chunk dropped pairs in some replica — re-plan with a
                # doubled bucket capacity, rebuild the runner, refresh the
                # carried cell lists, and retry from the chunk's start
                retries += 1
                if retries > 4:
                    raise RuntimeError(
                        "cell-list bucket overflow persists after 4 "
                        "capacity doublings"
                    )
                ncells, cap, r_cut, skin = ff.cell_cfg
                ff = dataclasses.replace(
                    ff, cell_cfg=(ncells, max(cap + 4, cap * 2), r_cut, skin)
                )
                logging.getLogger(__name__).warning(
                    "cell-list overflow in replica batch: re-planned with "
                    "cap=%d, retrying chunk", ff.cell_cfg[1],
                )
                step = build_step(ff)
                if pre_chunk.cell_list is not None:
                    clists = jax.jit(jax.vmap(ff.build_cells))(
                        pre_chunk.position, pre_chunk.box_L
                    )
                    pre_chunk = pre_chunk.replace(
                        cell_list=clists, cell_anchor=pre_chunk.position,
                    )
                if mesh is not None:
                    pre_chunk = shard_state(pre_chunk, mesh, batched=True)
                runner = build_runner(step, pre_chunk)
            per = split_replica_obs(obs_np, n_rep)
            for k, (per_rep, o) in enumerate(zip(trackers, per)):
                if finished[k]:
                    continue
                # drop rows past this replica's runtime crossing (keep the
                # crossing row itself, like the sequential path's final
                # trimmed chunk)
                tp = o["time_au"] * PC.TIME_PS_CONVERSION
                n_keep = min(len(tp), int(np.searchsorted(tp, args.runtime)) + 1)
                if n_keep < len(tp):
                    o = {kk: vv[:n_keep] for kk, vv in o.items()}
                for tr in per_rep:
                    tr.consume(o)
            write_frames(batched)
        wall = time.time() - t0
        steps = int(np.asarray(batched.timestep)[0])
        print(f"vmapped {n_rep} replicas x {steps} steps in {wall:.1f}s "
              f"({n_rep * steps / max(wall, 1e-9):.0f} aggregate steps/s)")

        write_frames(batched)  # final frames for any replica not yet closed
        for f in gsd_files:
            f.close()
        return True
    finally:
        os.chdir(cwd)


def resolved_box(args) -> float:
    """--box-L, or the reference box scaled at constant density
    (core/system.py:reference_box_for)."""
    if getattr(args, "box_L", None):
        return float(args.box_L)
    from cavmd_tpu.core.system import reference_box_for

    return reference_box_for(args.n_molecules)


def _method_spec(kind, group, kT, tau_ps, args=None):
    from cavmd_tpu.core.units import PhysicalConstants as PC
    from cavmd_tpu.integrate import MethodSpec

    kind = kind.lower()
    if kind == "bussi":
        return MethodSpec(kind="bussi", group=group, kT=kT,
                          tau=PC.ps_to_atomic_units(tau_ps))
    if kind == "langevin":
        gamma = PC.gamma_from_tau_ps(tau_ps)
        if group == "cavity" and args is not None:
            gamma *= args.cavity_damping_factor if hasattr(
                args, "cavity_damping_factor") else 1.0
        return MethodSpec(kind="langevin", group=group, kT=kT, gamma=gamma)
    if kind == "brownian":
        gamma = PC.gamma_from_tau_ps(tau_ps)
        if group == "cavity" and args is not None:
            gamma *= args.cavity_damping_factor if hasattr(
                args, "cavity_damping_factor") else 1.0
        return MethodSpec(kind="brownian", group=group, kT=kT, gamma=gamma)
    if kind == "none":
        return MethodSpec(kind="nve", group=group)
    raise ValueError(f"invalid thermostat {kind}")


def run_single_experiment(args, replica, frame):
    """One experiment in its coupling-named directory
    (parity: 05_advanced_run.py:1353-1439)."""
    incavity = not args.no_cavity
    if incavity:
        coupling_str = f"{args.coupling:.0e}".replace("-", "neg").replace("+", "pos")
        exp_dir = Path(f"cavity_coupling_{coupling_str}")
    else:
        exp_dir = Path("no_cavity")
    exp_dir.mkdir(exist_ok=True)

    error_tolerance = 0.0 if args.fixed_timestep else 1.0
    sim = CavityMDSimulation(
        job_dir=str(exp_dir),
        replica=replica,
        freq=args.frequency,
        couplstr=args.coupling,
        incavity=incavity,
        runtime_ps=args.runtime,
        input_gsd=args.input_gsd,
        frame=frame,
        name="prod",
        error_tolerance=error_tolerance,
        temperature=args.temperature,
        molecular_thermostat=args.molecular_bath,
        cavity_thermostat=args.cavity_bath if incavity else "none",
        finite_q=args.finite_q,
        molecular_thermostat_tau=args.molecular_tau,
        cavity_thermostat_tau=args.cavity_tau,
        enable_fkt=args.enable_fkt,
        fkt_kmag=args.fkt_kmag,
        fkt_num_wavevectors=args.fkt_wavevectors,
        fkt_reference_interval_ps=args.fkt_ref_interval,
        fkt_max_references=args.fkt_max_refs,
        max_energy_output_time_ps=args.max_energy_output_time,
        enable_energy_tracking=args.enable_energy_tracker,
        dt_fs=args.timestep if args.fixed_timestep else None,
        device=args.device,
        energy_output_period_ps=args.energy_output_period_ps,
        fkt_output_period_ps=args.fkt_output_period_ps,
        gsd_output_period_ps=args.gsd_output_period_ps,
        console_output_period_ps=args.console_output_period_ps,
        truncate_gsd=args.truncate_gsd,
        seed=args.seed + replica if args.seed is not None else None,
        n_molecules=args.n_molecules,
        box_L=resolved_box(args),
        precision=args.precision,
        shard_atoms=args.shard_atoms,
        pad_atoms=args.pad_atoms,
        pppm_resolution=args.pppm_resolution,
        rng_impl=args.rng_impl,
    )
    return sim.run() == 0


def build_parser():
    parser = argparse.ArgumentParser(
        description="Advanced Cavity MD Experiment Runner (cavmd_tpu)",
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("--molecular-bath", type=str, default="bussi",
                        choices=["bussi", "langevin", "brownian", "none"])
    parser.add_argument("--cavity-bath", type=str, default="langevin",
                        choices=["bussi", "langevin", "brownian", "none"])
    parser.add_argument("--finite-q", action="store_true")
    parser.add_argument("--coupling", type=float, default=1e-3)
    parser.add_argument("--temperature", type=float, default=100.0)
    parser.add_argument("--frequency", type=float, default=2000.0)
    parser.add_argument("--runtime", type=float, default=500.0)
    parser.add_argument("--no-cavity", action="store_true")
    parser.add_argument("--replicas", type=str)
    parser.add_argument("--molecular-tau", type=float, default=5.0)
    parser.add_argument("--cavity-tau", type=float, default=5.0)
    parser.add_argument("--fixed-timestep", action="store_true")
    parser.add_argument("--timestep", type=float, default=1.0,
                        help="Fixed timestep in fs")
    parser.add_argument("--enable-energy-tracker", action="store_true")
    parser.add_argument("--energy-output-period-ps", type=float, default=0.1)
    parser.add_argument("--fkt-output-period-ps", type=float, default=1.0)
    parser.add_argument("--gsd-output-period-ps", type=float, default=50.0)
    parser.add_argument("--console-output-period-ps", type=float, default=1.0)
    parser.add_argument("--enable-fkt", action="store_true")
    parser.add_argument("--fkt-kmag", type=float, default=1.0)
    parser.add_argument("--fkt-wavevectors", type=int, default=50)
    parser.add_argument("--fkt-ref-interval", type=float, default=1.0)
    parser.add_argument("--fkt-max-refs", type=int, default=10)
    parser.add_argument("--max-energy-output-time", type=float)
    parser.add_argument("--device", type=str, default="TPU",
                        choices=["CPU", "GPU", "TPU"],
                        help="Compute device (TPU = default accelerator)")
    parser.add_argument("--truncate-gsd", action="store_true")
    # cavmd_tpu extensions
    parser.add_argument("--vmap-replicas", action="store_true",
                        help="advance all replicas as one vmapped batch "
                             "on one chip (generated scene; per-replica "
                             "energy trackers + final GSD frames)")
    parser.add_argument("--shard-replicas", type=int, default=0,
                        help="shard the vmapped replica batch over this "
                             "many devices (replica x atoms mesh; implies "
                             "--vmap-replicas; composable with "
                             "--shard-atoms) — the TPU answer to the "
                             "reference's SLURM array scale-out")
    parser.add_argument("--shard-atoms", type=int, default=0,
                        help="shard particle arrays over this many devices "
                             "(1 x K mesh; N is ghost-padded to a multiple "
                             "of K; XLA inserts the dipole/KE/PPPM psums)")
    parser.add_argument("--rng-impl", choices=("auto", "threefry", "rbg"),
                        default="auto",
                        help="PRNG backend for the thermostat streams. "
                             "auto (default) = rbg on TPU, threefry "
                             "elsewhere. rbg (XLA RngBitGenerator) is a "
                             "measured 8.8%% faster full step on the N=501 "
                             "flagship (v5e); threefry bits are invariant "
                             "under sharding and across compiler versions "
                             "— pass it explicitly for bitwise-reproducible "
                             "or --pad-atoms comparator runs")
    parser.add_argument("--pad-atoms", type=int, default=0,
                        help="ghost-pad N to a multiple WITHOUT sharding "
                             "(single-device bitwise comparator for "
                             "--shard-atoms runs; RNG draws are N-shaped)")
    parser.add_argument("--input-gsd", type=str, default="../init-0.gsd")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--n-molecules", type=int, default=250,
                        help="molecules when generating a missing input GSD")
    parser.add_argument("--box-L", type=float, default=None,
                        help="cubic box edge (bohr) for the generated "
                             "system; default scales the reference box "
                             "(46.0 at 250 molecules) at constant density")
    parser.add_argument("--pppm-resolution", type=int, default=32,
                        help="PPPM mesh points per axis (reference default "
                             "32; the mesh should grow ~N^(1/3) for "
                             "constant spacing — 64 at ~100k particles; "
                             "large meshes auto-select the VMEM-resident "
                             "Pallas spread)")
    parser.add_argument("--precision", type=str, default="auto",
                        choices=["auto", "f32", "f64"],
                        help="auto = f64 on CPU (fidelity), f32 on TPU/GPU")
    return parser


def main(argv=None):
    """Parity: reference main() (05_advanced_run.py:1441-1632)."""
    from cavmd_tpu.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)

    print("Advanced Cavity MD Experiment Runner (cavmd_tpu)")
    print("=" * 50)

    task_id, job_id = get_slurm_info()
    if task_id is not None:
        replica_list = [task_id]
        print(f"SLURM array job detected: Task {task_id} (Job {job_id})")
    else:
        replica_list = parse_replicas(args.replicas)
        print(f"Local execution: Replicas {replica_list}")

    start = time.time()
    ok = fail = 0
    if args.vmap_replicas or args.shard_replicas > 1:
        success = run_vmapped_replicas(args, replica_list)
        print(f"\nvmapped batch: {'SUCCESS' if success else 'FAILED'}")
        print(f"Wall time: {time.time() - start:.2f} seconds")
        return 0 if success else 1
    for replica in replica_list:
        frame = replica  # replica doubles as input frame (reference 1571)
        print(f"\nRunning replica {replica}...")
        if run_single_experiment(args, replica, frame):
            ok += 1
            print(f"SUCCESS: Replica {replica} completed successfully")
        else:
            fail += 1
            print(f"ERROR: Replica {replica} failed")

    print("\n" + "=" * 50)
    print(f"Total replicas: {len(replica_list)}  Successful: {ok}  Failed: {fail}")
    print(f"Wall time: {time.time() - start:.2f} seconds")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
