"""Replica batching: vmap a population of trajectories on one chip, shard
the batch axis across the mesh.

Rebuilds the reference's replica parallelism (SURVEY.md §2.4): one SLURM
array task per replica (submit.sh ``--array=0-499``) becomes a single
batched program — same physics parameters, per-replica PRNG streams and
(optionally) per-replica initial frames. The entire replica batch advances
in one fused XLA step; batched observables stream out with a leading
replica axis.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cavmd_tpu.core.snapshot import Snapshot
from cavmd_tpu.integrate.forcefield import ForceField
from cavmd_tpu.integrate.integrator import MDState, init_state, run_steps
from cavmd_tpu.integrate.rng import STREAM_THERMALIZE, master_key, stream_key
from cavmd_tpu.integrate.thermostats import thermalize_velocities


def init_replica_states(
    snapshots: Snapshot | Sequence[Snapshot],
    ff: ForceField,
    *,
    n_replicas: int | None = None,
    dt: float,
    seed: int = 0,
    kT: float | None = None,
    error_tolerance: float = 0.0,
) -> MDState:
    """Build a batched MDState with a leading replica axis.

    Either one snapshot replicated ``n_replicas`` times (with per-replica
    thermal velocities when ``kT`` is given — replicas decorrelate through
    their momenta and stochastic baths), or a sequence of per-replica
    snapshots (e.g. different frames of an input trajectory, the
    reference's replica=frame convention, 05_advanced_run.py:1571).
    """
    if isinstance(snapshots, Snapshot):
        assert n_replicas is not None
        snaps = [snapshots] * n_replicas
    else:
        snaps = list(snapshots)
        n_replicas = len(snaps)

    states = []
    for r, snap in enumerate(snaps):
        if kT is not None:
            # ghost-padded rows (sharding) join NO group: their 1e30 pinning
            # mass would dominate the drift-removal momentum sum
            from cavmd_tpu.integrate.integrator import group_mask

            mol_mask = group_mask(
                snap.typeid, ff.l_typeid, "molecular", ff.ghost_typeid
            )
            key = stream_key(master_key(seed + r), STREAM_THERMALIZE, 0)
            v = thermalize_velocities(key, snap.mass, mol_mask, kT)
            if ff.l_typeid >= 0:
                k2 = stream_key(master_key(seed + r), STREAM_THERMALIZE, 1)
                cav_mask = snap.typeid == ff.l_typeid
                v = v + thermalize_velocities(
                    k2, snap.mass, cav_mask, kT, remove_drift=False
                )
            snap = snap.replace(velocity=v)
        states.append(
            init_state(snap, ff, dt=dt, seed=seed + r,
                       error_tolerance=error_tolerance)
        )
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def make_replica_step(step_fn):
    """vmap the fused step over the leading replica axis."""
    return jax.vmap(step_fn)


def run_replica_steps(step_fn, batched_state: MDState, n_steps: int):
    """Scan the vmapped step; obs arrays gain a (steps, replicas) shape."""
    return run_steps(make_replica_step(step_fn), batched_state, n_steps)


def split_replica_obs(obs, n_replicas: int):
    """Split batched obs into per-replica obs dicts (for per-replica
    trackers writing per-replica files)."""
    out = []
    for r in range(n_replicas):
        out.append({k: np.asarray(v)[:, r] for k, v in obs.items()})
    return out
